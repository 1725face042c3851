"""PropertyGraph: the engine's graph-as-DataFrames data model.

Mirrors the reference's nine-store record model (SURVEY.md §1.2,
`consistency-check/.../full/FullCheck.java:97-123`) re-expressed
relationally (FIXTURES.md §1):

- ``nodes(id, in_use, next_rel, next_prop)``
- ``relationships(id, in_use, src, dst, type_id, src_prev, src_next,
  dst_prev, dst_next, next_prop)`` — the two per-endpoint doubly-linked
  chains of `RelationshipRecordCheck.java:35-37` become explicit pointer
  columns; *derived* chain order (ascending id per endpoint) must agree
  with them, which is exactly what the validation suite checks.
- ``properties(id, in_use, owner_id, owner_kind, prev_prop, next_prop,
  seq, key_id, vtype, value_long, value_string, value_array)`` — property
  records + blocks flattened (`PropertyRecordCheck.java:35-165`); the
  string/array dynamic stores are folded into typed value columns.
- ``relationship_types(id, in_use, name)`` / ``property_keys(id, in_use,
  name)`` — the two dictionaries (`NameRecordCheck.java:30-73`); always
  broadcast-joined (the reference pre-caches them,
  `FullCheck.java:128-134`).
- ``graph_props`` — the NeoStore singleton's property chain
  (`NeoStoreCheck.java:29-50`), same schema as ``properties``.

Storage: one parquet dir per table under a versioned snapshot root
(``<root>/v<txid>/<table>``) — snapshot isolation instead of locks
(SURVEY §3.1). At scale, nodes/relationships are written bucketed by
id/src so adjacency and pointer joins co-partition.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

NO_POINTER = -1  # the reference's Record.NO_NEXT_RELATIONSHIP / NO_NEXT_PROPERTY

GRAPH_TABLES = (
    "nodes",
    "relationships",
    "properties",
    "relationship_types",
    "property_keys",
    "graph_props",
)


@dataclass
class PropertyGraph:
    nodes: DataFrame
    relationships: DataFrame
    properties: DataFrame
    relationship_types: DataFrame
    property_keys: DataFrame
    graph_props: DataFrame | None = None

    def tables(self) -> dict[str, DataFrame]:
        out = {
            "nodes": self.nodes,
            "relationships": self.relationships,
            "properties": self.properties,
            "relationship_types": self.relationship_types,
            "property_keys": self.property_keys,
        }
        if self.graph_props is not None:
            out["graph_props"] = self.graph_props
        return out

    def persist(self) -> "PropertyGraph":
        """Materialize every table in executor memory. The validation
        suite reads each store many times (one plan per rule family);
        persisting mirrors the reference checker reading materialized
        store files instead of regenerating them. On a cluster, tables
        loaded from parquet snapshots get this for free from scan reuse
        + the page cache."""
        return PropertyGraph(
            nodes=self.nodes.persist(),
            relationships=self.relationships.persist(),
            properties=self.properties.persist(),
            relationship_types=self.relationship_types.persist(),
            property_keys=self.property_keys.persist(),
            graph_props=self.graph_props.persist() if self.graph_props is not None else None,
        )

    def save(self, root: str, version: int = 0) -> str:
        """Write a snapshot (S8 full backup: `Master.copyStore`,
        `MasterImpl.java:487-492` → per-table parquet export)."""
        vdir = os.path.join(root, f"v{version}")
        for name, df in self.tables().items():
            df.write.mode("overwrite").parquet(os.path.join(vdir, name))
        return vdir

    @classmethod
    def load(cls, spark: SparkSession, root: str, version: int = 0) -> "PropertyGraph":
        vdir = os.path.join(root, f"v{version}")
        dfs = {}
        for name in GRAPH_TABLES:
            path = os.path.join(vdir, name)
            dfs[name] = spark.read.parquet(path) if os.path.exists(path) else None
        return cls(
            nodes=dfs["nodes"],
            relationships=dfs["relationships"],
            properties=dfs["properties"],
            relationship_types=dfs["relationship_types"],
            property_keys=dfs["property_keys"],
            graph_props=dfs["graph_props"],
        )
