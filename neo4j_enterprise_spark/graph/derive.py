"""Deterministic TPC-H → property-graph derivation.

The driver's DuckDB oracle only knows the TPC-H-ish tables, so every
*graph-model* declared query (SURVEY.md §2: adjacency, degree, endpoint
anti-joins, chain/window checks, traversal) runs over a property graph
derived 1:1 from those tables. The SAME derivation is written twice — once
as a PySpark plan here, once as SQL CTE text the oracles embed — so a
hash-match proves the graph operator, not the derivation.

Node id spaces (disjoint ranges, all BIGINT):

========== ===========================
customer    ``c_custkey``
order       ``1_000_000 + o_orderkey``
part        ``2_000_000 + p_partkey``
supplier    ``3_000_000 + s_suppkey``
nation      ``4_000_000 + n_nationkey``
region      ``5_000_000 + r_regionkey``
========== ===========================

``in_use``: customer nodes with ``c_custkey % 7 == 0`` model deleted record
slots (the reference checker skips ``!record.inUse()`` rows and reports
references *to* them — `NodeRecordCheck.java:55-58`); with clean TPC-H data
this is what makes the dangling-endpoint anti-joins return real violations.

Relationship id spaces / types:

=============== ==== ================================================
PLACED          1    ``o_orderkey``; customer → order
CONTAINS        2    ``1e9 + (l_orderkey*8 + l_linenumber)*16 + dup_seq``;
                     order → part (dup_seq disambiguates duplicate
                     (orderkey, linenumber) pairs in the synthetic data)
IN_NATION       3    ``2.0e9 + c_custkey``; customer → nation
SUPP_NATION     4    ``2.1e9 + s_suppkey``; supplier → nation
IN_REGION       5    ``2.2e9 + n_nationkey``; nation → region
=============== ==== ================================================

Chain order (the reference's per-node relationship linked lists,
`RelationshipRecordCheck.java:35-37`) is declared as *ascending rel id per
src node* — reproduced with a window, exactly as SURVEY §2.5 prescribes.

At 100 TB scale: the derivation is a pure per-row projection (no shuffle);
unions are narrow; every downstream join keys on the derived BIGINT ids, so
partitioning survives and Catalyst pushes projections into the scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# offsets
ORDER_OFF = 1_000_000
PART_OFF = 2_000_000
SUPP_OFF = 3_000_000
NATION_OFF = 4_000_000
REGION_OFF = 5_000_000
CONTAINS_OFF = 1_000_000_000
IN_NATION_OFF = 2_000_000_000
SUPP_NATION_OFF = 2_100_000_000
IN_REGION_OFF = 2_200_000_000


# Memoized persisted copies, keyed by (session, sf_dir). Many declared
# queries share the derivation; persisting it once turns 5-6 parquet
# unions per query into an in-memory scan (the tables are a few MB even
# at sf0.1 — at real scale you'd materialize them with
# write_graph_tables instead).
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _memo(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    key = (id(spark._jsparkSession), sf_dir, kind)
    if key not in _CACHE:
        _CACHE[key] = build().persist()
    return _CACHE[key]


def derived_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes(id BIGINT, kind STRING, in_use BOOLEAN, name STRING)."""
    return _memo(spark, sf_dir, "nodes", lambda: _derived_nodes(spark, sf_dir))


def _derived_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lit("customer").alias("kind"),
        (F.col("c_custkey") % 7 != 0).alias("in_use"),
        F.col("c_name").alias("name"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + ORDER_OFF).cast("long").alias("id"),
        F.lit("order").alias("kind"),
        F.lit(True).alias("in_use"),
        F.col("o_orderkey").cast("string").alias("name"),
    )
    p = load_table(spark, sf_dir, "part").select(
        (F.col("p_partkey") + PART_OFF).cast("long").alias("id"),
        F.lit("part").alias("kind"),
        F.lit(True).alias("in_use"),
        F.col("p_name").alias("name"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + SUPP_OFF).cast("long").alias("id"),
        F.lit("supplier").alias("kind"),
        F.lit(True).alias("in_use"),
        F.col("s_name").alias("name"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + NATION_OFF).cast("long").alias("id"),
        F.lit("nation").alias("kind"),
        F.lit(True).alias("in_use"),
        F.col("n_name").alias("name"),
    )
    r = load_table(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + REGION_OFF).cast("long").alias("id"),
        F.lit("region").alias("kind"),
        F.lit(True).alias("in_use"),
        F.col("r_name").alias("name"),
    )
    return c.unionByName(o).unionByName(p).unionByName(s).unionByName(n).unionByName(r)


def derived_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relationships(id, src, dst BIGINT, type_id INT, type_name STRING)."""
    return _memo(spark, sf_dir, "rels", lambda: _derived_rels(spark, sf_dir))


def _derived_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    placed = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") + ORDER_OFF).cast("long").alias("dst"),
        F.lit(1).alias("type_id"),
        F.lit("PLACED").alias("type_name"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data (up
    # to 6 duplicates per pair), so a windowed sequence disambiguates —
    # partitioned by the pair (distributed; no global window), ordered by
    # the remaining columns, which are unique within a pair.
    from pyspark.sql.window import Window

    w_dup = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    contains = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("seq", F.row_number().over(w_dup))
        .select(
            (
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 16
                + F.col("seq")
                + CONTAINS_OFF
            )
            .cast("long")
            .alias("id"),
            (F.col("l_orderkey") + ORDER_OFF).cast("long").alias("src"),
            (F.col("l_partkey") + PART_OFF).cast("long").alias("dst"),
            F.lit(2).alias("type_id"),
            F.lit("CONTAINS").alias("type_name"),
        )
    )
    in_nation = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + IN_NATION_OFF).cast("long").alias("id"),
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey") + NATION_OFF).cast("long").alias("dst"),
        F.lit(3).alias("type_id"),
        F.lit("IN_NATION").alias("type_name"),
    )
    supp_nation = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + SUPP_NATION_OFF).cast("long").alias("id"),
        (F.col("s_suppkey") + SUPP_OFF).cast("long").alias("src"),
        (F.col("s_nationkey") + NATION_OFF).cast("long").alias("dst"),
        F.lit(4).alias("type_id"),
        F.lit("SUPP_NATION").alias("type_name"),
    )
    in_region = load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + IN_REGION_OFF).cast("long").alias("id"),
        (F.col("n_nationkey") + NATION_OFF).cast("long").alias("src"),
        (F.col("n_regionkey") + REGION_OFF).cast("long").alias("dst"),
        F.lit(5).alias("type_id"),
        F.lit("IN_REGION").alias("type_name"),
    )
    return (
        placed.unionByName(contains)
        .unionByName(in_nation)
        .unionByName(supp_nation)
        .unionByName(in_region)
    )


# --- SQL twins (DuckDB CTE bodies) -------------------------------------
# Keep these textually in sync with the DataFrame plans above.

NODES_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS id, 'customer' AS kind,
       (c_custkey % 7 <> 0) AS in_use, c_name AS name FROM customer
UNION ALL
SELECT CAST(o_orderkey + 1000000 AS BIGINT), 'order', TRUE,
       CAST(o_orderkey AS VARCHAR) FROM orders
UNION ALL
SELECT CAST(p_partkey + 2000000 AS BIGINT), 'part', TRUE, p_name FROM part
UNION ALL
SELECT CAST(s_suppkey + 3000000 AS BIGINT), 'supplier', TRUE, s_name FROM supplier
UNION ALL
SELECT CAST(n_nationkey + 4000000 AS BIGINT), 'nation', TRUE, n_name FROM nation
UNION ALL
SELECT CAST(r_regionkey + 5000000 AS BIGINT), 'region', TRUE, r_name FROM region
"""

RELS_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS id, CAST(o_custkey AS BIGINT) AS src,
       CAST(o_orderkey + 1000000 AS BIGINT) AS dst,
       1 AS type_id, 'PLACED' AS type_name FROM orders
UNION ALL
SELECT CAST((l_orderkey * 8 + l_linenumber) * 16
            + ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                 ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice)
            + 1000000000 AS BIGINT),
       CAST(l_orderkey + 1000000 AS BIGINT),
       CAST(l_partkey + 2000000 AS BIGINT), 2, 'CONTAINS' FROM lineitem
UNION ALL
SELECT CAST(c_custkey + 2000000000 AS BIGINT), CAST(c_custkey AS BIGINT),
       CAST(c_nationkey + 4000000 AS BIGINT), 3, 'IN_NATION' FROM customer
UNION ALL
SELECT CAST(s_suppkey + 2100000000 AS BIGINT), CAST(s_suppkey + 3000000 AS BIGINT),
       CAST(s_nationkey + 4000000 AS BIGINT), 4, 'SUPP_NATION' FROM supplier
UNION ALL
SELECT CAST(n_nationkey + 2200000000 AS BIGINT), CAST(n_nationkey + 4000000 AS BIGINT),
       CAST(n_regionkey + 5000000 AS BIGINT), 5, 'IN_REGION' FROM nation
"""


def graph_cte(*, nodes: bool = True, rels: bool = True) -> str:
    """WITH-clause text for oracle SQL; include only what the query needs."""
    parts = []
    if nodes:
        parts.append(f"nodes AS ({NODES_SQL})")
    if rels:
        parts.append(f"rels AS ({RELS_SQL})")
    return "WITH " + ",\n".join(parts)


def write_graph_tables(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize the derived graph as parquet (bucketing-ready layout).

    At scale you'd bucket both tables by their join keys
    (``nodes.id`` / ``rels.src``) so adjacency joins are shuffle-free; in
    plain parquet we approximate with ``repartition`` on the key so each
    file covers a key range and AQE can coalesce.
    """
    os.makedirs(out_dir, exist_ok=True)
    derived_nodes(spark, sf_dir).repartition("id").write.mode("overwrite").parquet(
        os.path.join(out_dir, "nodes.parquet")
    )
    derived_rels(spark, sf_dir).repartition("src").write.mode("overwrite").parquet(
        os.path.join(out_dir, "rels.parquet")
    )
