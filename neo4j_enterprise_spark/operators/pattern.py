"""Pattern matching: Cypher-ish fixed-length path patterns compiled to
joins.

The reference has no Cypher in-repo, but its traversal surface
(`LockableNode.java:178-201`) plus the HA test workloads are path
navigations; SURVEY §4 notes a pattern DSL compiles to joins with no
custom Catalyst work. ``match_path`` is that compiler: a list of
(rel_type, direction) steps becomes a chain of equi-joins, one join per
hop, each keyed on the node id — co-partitioned on a bucketed layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_path(
    nodes: DataFrame,
    rels: DataFrame,
    steps: Sequence[tuple[str, str]],
    start_filter=None,
) -> DataFrame:
    """Match a fixed-length path pattern.

    ``steps``: [(type_name, 'out'|'in'), ...]. Returns one row per bound
    path with columns n0, n1, ... nK (node ids along the path).
    ``start_filter``: optional Column predicate on the start node.

    Example — (customer)-[:PLACED]->(o)-[:CONTAINS]->(p):
        match_path(nodes, rels, [("PLACED", "out"), ("CONTAINS", "out")])
    """
    start = nodes.select(F.col("id").alias("n0"))
    if start_filter is not None:
        start = nodes.filter(start_filter).select(F.col("id").alias("n0"))
    out = start
    for i, (type_name, direction) in enumerate(steps):
        e = rels.filter(F.col("type_name") == type_name)
        if direction == "out":
            edge = e.select(F.col("src").alias(f"n{i}"), F.col("dst").alias(f"n{i + 1}"))
        else:
            edge = e.select(F.col("dst").alias(f"n{i}"), F.col("src").alias(f"n{i + 1}"))
        out = out.join(edge, f"n{i}")
    return out
