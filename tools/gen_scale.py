#!/usr/bin/env python
"""Generate a larger scale factor by TILING the driver's sf0.1 parquet
with disjoint key ranges — /root/testdata is read-only and the driver
generator is not available, so scale-up data is derived, never invented:
every tile is an exact copy of sf0.1 with all entity keys shifted by
tile_index * stride, which preserves per-key row counts, value
distributions, join fan-outs and skew exactly while multiplying volume.
Cross-tile joins never occur (key ranges are disjoint), which is the
right shape for throughput scaling runs: the per-key working set stays
realistic and the global volume grows linearly.

Usage: python tools/gen_scale.py [tiles] [out_dir]
  default: 10 tiles (= sf1) into /root/repo/localdata/sf1

Dimension constants (region, nation) are copied once. Strides are
rounded up to the next power of ten above the sf0.1 max key so tiled
ids stay readable. ~25 s and ~350 MB for sf1 with DuckDB doing the
tiling (no Spark needed).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride} key shifts; strides are powers of ten above
# the sf0.1 max for every keyspace:
#   custkey max 15000 -> 100_000      suppkey max 1000   -> 10_000
#   partkey max 20000 -> 100_000      orderkey max ~600k -> 1_000_000
#   event_id max 100k -> 1_000_000    user_id max ~1500  -> 10_000
#   doc_id max 5000   -> 10_000       vec_id max 2000    -> 10_000
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
COPY_ONCE = ["region", "nation"]


def generate(tiles: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = ", ".join(
            f"{c} + CAST(i.i * {shifts[c]} AS BIGINT) AS {c}"
            if c in shifts
            else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM {src}, range({tiles}) i(i)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({tiles} tiles)")


if __name__ == "__main__":
    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/localdata/sf1"
    )
    generate(tiles, out)
