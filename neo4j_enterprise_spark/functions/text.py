"""Text tokenization column builders (shared by text analysis + dedup)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def n_tokens(text_col: Column) -> Column:
    """Whitespace token count as a pure expression: #spaces-in-collapsed
    text + 1 (identical formula to the DuckDB oracles)."""
    t = F.trim(text_col)
    return (F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1).cast("long")
