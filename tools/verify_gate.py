import sys
sys.path.insert(0, "/root/repo")
import math
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
from neo4j_enterprise_spark.catalog import TABLES
from neo4j_enterprise_spark.plans import all_queries

spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
QUERIES = all_queries()

def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool): v = bool(v)
            elif isinstance(v, float): v = float(v)
            elif isinstance(v, int): v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
bad = 0
for name, q in QUERIES.items():
    try:
        if q.oracle is None:
            q.spark(spark, SF).count()
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
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        if not (x == y or (math.isnan(x) and math.isnan(y))): ok = False
                    elif x != y:
                        ok = False
                if not ok: break
        if not ok:
            bad += 1
            print("MISMATCH", name, flush=True)
    except Exception as ex:
        bad += 1
        print("ERROR", name, type(ex).__name__, str(ex)[:150], flush=True)
print("TOTAL_BAD", bad, "of", len(QUERIES))
