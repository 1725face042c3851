"""Replay the driver's t2 correctness gate locally.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares column-name-sorted stringified
rows (order-insensitive) — the same comparison shape the round driver uses
for CORRECTNESS_r{N}.json.

Usage: python tools/gate_replay.py [sf_dir] [--only name ...]
(default sf_dir /root/testdata/sf0.01; --only restricts to named queries)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1 :])
        argv = argv[:i]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    mismatched = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(str(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as ex:  # noqa: BLE001
            mismatched.append(name)
            print(f"FAIL  {name}: spark error {ex}")
            continue
        if sql is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(sql)
            raw_cols = [d[0] for d in cur.description]
            raw_rows = cur.fetchall()
            order = sorted(range(len(raw_cols)), key=lambda i: raw_cols[i])
            ocols = [raw_cols[i] for i in order]
            orows = sorted(
                tuple(str(row[i]) for i in order) for row in raw_rows
            )
        except Exception as ex:  # noqa: BLE001
            mismatched.append(name)
            print(f"FAIL  {name}: duckdb error {ex}")
            continue
        if scols != ocols:
            mismatched.append(name)
            print(f"FAIL  {name}: columns {scols} != {ocols}")
        elif srows != orows:
            mismatched.append(name)
            diff = next(
                (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                min(len(srows), len(orows)),
            )
            print(
                f"FAIL  {name}: rows {len(srows)} vs {len(orows)}; "
                f"first diff @{diff}: "
                f"{srows[diff] if diff < len(srows) else '<none>'} vs "
                f"{orows[diff] if diff < len(orows) else '<none>'}"
            )
        else:
            print(f"ok    {name}: {len(srows)} rows")
    print(f"MISMATCHED {len(mismatched)}{' ' + str(mismatched) if mismatched else ''}")
    return 1 if mismatched else 0


if __name__ == "__main__":
    sys.exit(main())
