"""Hash/checksum column builders.

- ``id_hash``: the reference's id spreading `(id>>>32)^id`
  (`LockableNode.hashCode:100-103`) → ``xxhash64`` (same role: uniform
  spread for partitioning/bucketing keys).
- ``checksum_column``: per-row tx checksum (`TxChecksumVerifier.java`,
  F5) — xxhash64 over the op payload columns (JVM-side).
- ``content_fingerprint``: md5 digest — the *portable* hash used wherever
  results must match the DuckDB oracle (xxhash64 is not cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def id_hash(*cols) -> Column:
    return F.xxhash64(*cols)


def checksum_column(*cols) -> Column:
    return F.xxhash64(*cols)


def content_fingerprint(col: Column) -> Column:
    return F.md5(col)
