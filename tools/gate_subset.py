"""Targeted twin of tools/verify_gate.py: replay the sf0.01 typed
Spark-vs-DuckDB compare for just the query names given on the command
line (fast check for newly added queries without re-running the full
registry)."""

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from neo4j_enterprise_spark.catalog import TABLES
from neo4j_enterprise_spark.plans import all_queries

SF = "/root/testdata/sf0.01"


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(row[i] for i in order) for row in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main(names):
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    queries = all_queries()
    missing = [n for n in names if n not in queries]
    if missing:
        print("UNKNOWN", missing)
        return 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        q = queries[name]
        if q.oracle is None:
            n = q.spark(spark, SF).count()
            print(name, "ROWS_ONLY", n, "rows")
            continue
        sdf = q.spark(spark, SF)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(q.oracle)
        d_cols = [d[0].lower() for d in res.description]
        d_rows = res.fetchall()
        ok = sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows)
        if ok:
            for a, b in zip(_norm(s_rows, s_cols), _norm(d_rows, d_cols)):
                if a != b:
                    eq = all(
                        (
                            isinstance(x, float)
                            and isinstance(y, float)
                            and (x == y or (math.isnan(x) and math.isnan(y)))
                        )
                        or x == y
                        for x, y in zip(a, b)
                    )
                    if not eq:
                        ok = False
                        print("  row diff:", a, "vs", b)
                        break
        print(name, "OK" if ok else "MISMATCH", len(s_rows), "rows")
        bad += 0 if ok else 1
    print("TOTAL_BAD", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
