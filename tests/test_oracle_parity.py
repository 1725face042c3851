"""Local twin of the driver's correctness gate: run every declared query
on Spark AND its DuckDB oracle at sf0.001, compare row count, column
names, and values (columns sorted by name, rows sorted, exact equality —
the engine's determinism rules make float results bit-identical)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from neo4j_enterprise_spark.catalog import TABLES
from neo4j_enterprise_spark.plans import all_queries

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                v = float(v)
            elif isinstance(v, int):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [tuple(sorted(cols))] + out


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.spark(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    s_norm = _normalize(s_rows, s_cols)
    d_norm = _normalize(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a != b:
            # floats: require exact bit equality, but report nicely
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    assert x == y or (math.isnan(x) and math.isnan(y)), (
                        f"{name} row {i}: {x!r} != {y!r} (Δ={x - y})\n{a}\n{b}"
                    )
                else:
                    assert x == y, f"{name} row {i}: {x!r} != {y!r}\n{a}\n{b}"
