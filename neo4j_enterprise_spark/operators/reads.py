"""Read-path operators: point lookup, adjacency, 1-hop expand, degree.

Reference surface (SURVEY.md §2.1/§2.2/§2.9):
- ``getNodeById`` — `ha/.../LockableNode.java:46` call sites → S6.
- ``getRelationships(Direction, RelationshipType...)`` —
  `LockableNode.java:121-176` → P4.
- ``getOtherNode`` 1-hop expand — `LockableRelationship.java:61` → T1.
- relationship count per node by type — `slavetest/CommonJobs.java:115-140`
  → A4.

Scale notes: point lookups are partition-prunable when the nodes table is
bucketed/sorted by id (the writer in ``graph.derive.write_graph_tables``
repartitions on the key); adjacency filters push `src = id` down to the
parquet scan; degree aggregation is a map-side-combinable groupBy.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Direction = str  # 'out' | 'in' | 'both'


def point_lookup(nodes: DataFrame, node_id: int) -> DataFrame:
    """S6: ``getNodeById(id)``."""
    return nodes.filter(F.col("id") == F.lit(node_id))


def rels_of(
    rels: DataFrame,
    node_id: int,
    direction: Direction = "both",
    types: Iterable[str] | None = None,
) -> DataFrame:
    """P4: ``getRelationships(Direction, RelationshipType...)``.

    Direction semantics mirror `Direction.OUTGOING/INCOMING/BOTH`: which
    endpoint column must equal the node. A self-loop matches BOTH once.
    """
    if direction == "out":
        cond = F.col("src") == F.lit(node_id)
    elif direction == "in":
        cond = F.col("dst") == F.lit(node_id)
    else:
        cond = (F.col("src") == F.lit(node_id)) | (F.col("dst") == F.lit(node_id))
    out = rels.filter(cond)
    if types is not None:
        out = out.filter(F.col("type_name").isin(list(types)))
    return out


def expand_1hop(
    nodes: DataFrame,
    rels: DataFrame,
    seeds: DataFrame,
    direction: Direction = "out",
    types: Iterable[str] | None = None,
) -> DataFrame:
    """T1: frontier ⋈ rels ⋈ nodes — ``getOtherNode`` over a seed set.

    ``seeds`` must have a single ``id`` column. Output: (seed, neighbor
    node row). Both joins are equi-joins on BIGINT ids — sort-merge or
    broadcast as Catalyst/AQE sees fit.
    """
    r = rels
    if types is not None:
        r = r.filter(F.col("type_name").isin(list(types)))
    if direction == "out":
        edges = r.select(F.col("src").alias("seed"), F.col("dst").alias("nbr"))
    elif direction == "in":
        edges = r.select(F.col("dst").alias("seed"), F.col("src").alias("nbr"))
    else:
        edges = r.select(F.col("src").alias("seed"), F.col("dst").alias("nbr")).unionByName(
            r.select(F.col("dst").alias("seed"), F.col("src").alias("nbr"))
        )
    hop = seeds.select(F.col("id").alias("seed")).join(edges, "seed")
    return hop.join(nodes, hop["nbr"] == nodes["id"]).drop("nbr")


def single_relationship(
    rels: DataFrame,
    node_id: int,
    rel_type: str,
    direction: Direction = "out",
) -> DataFrame:
    """P5: ``getSingleRelationship(type, dir)`` — 0-or-1 semantics,
    raises if the node has more than one matching relationship
    (`LockableNode.java:147-151` — the kernel throws NotFoundException
    on >1)."""
    matches = rels_of(rels, node_id, direction, [rel_type])
    found = matches.limit(2).collect()
    if len(found) > 1:
        raise ValueError(
            f"node {node_id} has more than one {rel_type} relationship ({direction})"
        )
    return matches


def degree_by_type(rels: DataFrame, direction: Direction = "out") -> DataFrame:
    """A4: relationship count per node per type (map-side combinable)."""
    if direction == "out":
        keyed = rels.select(F.col("src").alias("node_id"), "type_name")
    elif direction == "in":
        keyed = rels.select(F.col("dst").alias("node_id"), "type_name")
    else:
        keyed = rels.select(F.col("src").alias("node_id"), "type_name").unionByName(
            rels.select(F.col("dst").alias("node_id"), "type_name")
        )
    return keyed.groupBy("node_id", "type_name").agg(F.count("*").alias("degree"))


def degree_histogram(rels: DataFrame) -> DataFrame:
    """A3 analog: distribution of out-degree (two-level groupBy, both
    map-side combinable; no wide rows survive to the driver)."""
    deg = rels.groupBy("src").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
