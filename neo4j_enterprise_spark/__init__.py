"""PySpark-native property-graph analytics engine.

A brand-new engine with the query and data-processing capabilities of the
Neo4j 1.9 enterprise stack (reference: ``dmontag/neo4j-enterprise``), built
idiomatically on DataFrames / Spark SQL / Catalyst / Structured Streaming.

Layout
------
- ``session``   – SparkSession factory tuned for the target cluster shape.
- ``catalog``   – loaders for the driver testdata tables and graph tables.
- ``graph``     – property-graph model, deterministic fixture generator,
  and the TPC-H→graph derivation used by oracle-checkable declared queries.
- ``operators`` – read path (lookup/adjacency/degree), validation suite
  (the consistency-check workload as joins/anti-joins), traversal,
  mutation/versioning, diff, dedup, similarity, text analysis, multimodal.
- ``sources``   – snapshot export/restore (backup), tx-log export/replay.
- ``streaming`` – pull/push micro-batch replication feeds, watermarked
  window aggregates over the events stream.
- ``functions`` – reusable column expressions (hashing, vectors, text).
- ``plans``     – the declared-query registry: every SURVEY.md §2 operator
  exposed as a named (PySpark plan, DuckDB oracle SQL) pair.
"""

__version__ = "0.1.0"
