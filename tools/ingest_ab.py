#!/usr/bin/env python
"""At-rest ingest-layout A/B for the q1/q5 decode floor (VERDICT r10 ask #4).

q1/q5's residual vs DuckDB is attributed to the vectorized parquet
decode of the 60M-row lineitem scan (BASELINE §13). This tool A/Bs the
at-rest encoding knobs ANY deployment owns at ingest time — compression
codec (snappy / zstd-3 / zstd-9 / none), row-group size, data-page
size, dictionary encoding — by REWRITING lineitem under each config and
re-timing the two scan-bound queries, plus the layout that composes the
winner with the §13 bucketed layout. No query-specific enrichment (no
precomputed rev_q — that was judged benchmark-gaming and declined);
every knob here changes only how the same columns are stored.

Shipped-data baseline for reference: the driver's lineitem is
DuckDB-written — SNAPPY, PLAIN (no dictionary on numerics), 122 880-row
row groups (489 groups at sf10).

Method (same discipline as tools/bucketed_ab.py): one session, write
all layouts FIRST, then time — plan rebuilt every sample, System.gc()
between samples, median-of-N; DuckDB q1/q5 on the ORIGINAL file timed
in the same session (subprocess-isolated) as the ratio anchor; file
sizes disclosed so compression/speed trades are visible.

Usage: PYTHONPATH=. python tools/ingest_ab.py [sf_dir] [runs]
  default: localdata/sf10, median-of-3
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark import catalog
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

QUERIES = ("q1_pricing_summary", "q5_local_supplier_volume")

# layout name -> writer options (None = time the original file as-is)
LAYOUTS: dict[str, dict[str, str] | None] = {
    "original": None,
    # Spark rewrite at defaults: 128 MB row groups vs the original's
    # 123k-row ones — isolates the row-group-size effect at same codec
    "snappy_rg128m": {"compression": "snappy"},
    "snappy_rg32m": {"compression": "snappy", "parquet.block.size": str(32 << 20)},
    "zstd3": {"compression": "zstd", "parquet.compression.codec.zstd.level": "3"},
    "zstd9": {"compression": "zstd", "parquet.compression.codec.zstd.level": "9"},
    "uncompressed": {"compression": "none"},
    "snappy_nodict": {"compression": "snappy", "parquet.enable.dictionary": "false"},
    "snappy_page8m": {"compression": "snappy", "parquet.page.size": str(8 << 20)},
    # composed winner: zstd-3 (best q1) + 8 MB pages (best q5) + 32 MB
    # row groups (the rg knob's whole gain came at 32 MB)
    "combo_zstd3_pg8m_rg32m": {
        "compression": "zstd",
        "parquet.compression.codec.zstd.level": "3",
        "parquet.page.size": str(8 << 20),
        "parquet.block.size": str(32 << 20),
    },
}
OUT_ROOT = "spark-warehouse/ingest_ab"
N_FILES = 32  # constant file count across layouts (one per core)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cdb.RUNS = runs
    global LAYOUTS
    if len(sys.argv) > 3:  # subset: layout names as extra args
        LAYOUTS = {k: LAYOUTS[k] for k in ["original", *sys.argv[3:]]}

    spark = get_spark("ingest-ab")
    qs = all_queries()
    from neo4j_enterprise_spark.plans import relational

    print(f"# ingest-layout A/B  sf_dir={sf_dir}  runs={runs}", flush=True)

    # -- write every layout first (timing happens after all I/O churn) --
    paths: dict[str, str] = {}
    src = catalog.load_table(spark, sf_dir, "lineitem")
    for name, opts in LAYOUTS.items():
        if opts is None:
            paths[name] = os.path.join(sf_dir, "lineitem.parquet")
            continue
        out = os.path.join(OUT_ROOT, name)
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            shutil.rmtree(out, ignore_errors=True)
            w = src.coalesce(N_FILES).write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            w.parquet(out)
        size = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        paths[name] = out
        print(f"#   wrote {name}: {size / 1e9:.2f} GB", flush=True)
    # the original may be a Spark-written DIRECTORY dataset (ADVICE r11:
    # getsize on a dir returns the inode size, not the data size)
    orig = paths["original"]
    if os.path.isdir(orig):
        orig_size = sum(
            os.path.getsize(os.path.join(orig, f))
            for f in os.listdir(orig)
            if f.endswith(".parquet")
        )
    else:
        orig_size = os.path.getsize(orig)
    print(f"#   original: {orig_size / 1e9:.2f} GB", flush=True)

    flat_load = catalog.load_table

    def loader_for(path):
        def load(spark_, sf_dir_, name):
            if name == "lineitem":
                return spark_.read.parquet(path)
            return flat_load(spark_, sf_dir_, name)

        return load

    def gc_pause():
        spark.sparkContext._jvm.System.gc()

    results: dict[str, dict[str, float]] = {n: {} for n in LAYOUTS}
    for lname, path in paths.items():
        loader = loader_for(path)
        for qname in QUERIES:
            q = qs[qname]
            relational.load_table = loader
            q.spark(spark, sf_dir).collect()  # warm: codegen + file listing
            t = cdb.median5(
                lambda ld=loader, qq=q: (
                    setattr(relational, "load_table", ld),
                    qq.spark(spark, sf_dir).toPandas(),
                )[1],
                pre=gc_pause,
            )
            results[lname][qname] = t
            print(f"#   {lname} {qname}: {t:.3f}s", flush=True)
    relational.load_table = flat_load

    # -- DuckDB anchor on the original layout, same session ------------
    duck: dict[str, float] = {}
    for qname in QUERIES:
        status, val = cdb._oracle_median(sf_dir, qs[qname].oracle, runs)
        duck[qname] = val if status == "ok" else float("nan")
        print(f"#   duckdb(original) {qname}: {duck[qname]:.3f}s", flush=True)

    print("\n| layout | q1 s | q1 vs duck | q5 s | q5 vs duck |")
    print("|---|---|---|---|---|")
    for lname in LAYOUTS:
        r = results[lname]
        print(
            f"| {lname} | {r['q1_pricing_summary']:.2f} | "
            f"{r['q1_pricing_summary'] / duck['q1_pricing_summary']:.2f}x | "
            f"{r['q5_local_supplier_volume']:.2f} | "
            f"{r['q5_local_supplier_volume'] / duck['q5_local_supplier_volume']:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
