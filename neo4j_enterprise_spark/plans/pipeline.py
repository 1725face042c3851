"""Training-data pipeline declared queries over documents/embeddings.

Spark-native extensions (per the build brief): deduplication, text
analysis, similarity search. SQL-expressible variants carry DuckDB
oracles; the sketch-based ones (MinHash-LSH, SimHash) register with
rows-only checks where DuckDB can't express them faithfully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup, text
from . import register


@register(
    "docs_exact_dup_groups",
    """
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY content_hash
    """,
    doc="Exact dedup: hash-groupBy on content digest; keeps min doc_id "
    "per group (map-side combinable; the 100 TB-scale default dedup).",
    bench=True,
)
def docs_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs).orderBy("content_hash")


@register(
    "docs_fingerprints",
    """
    SELECT doc_id, md5(text) AS fingerprint FROM documents
    WHERE doc_id < 100 ORDER BY doc_id
    """,
    doc="Document fingerprinting (digest-based identity column).",
)
def docs_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")


@register(
    "docs_token_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS BIGINT) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
    doc="Token counting (whitespace tokenizer as a pure column "
    "expression — stays in whole-stage codegen).",
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs).select("doc_id", "n_chars_actual", "n_tokens").orderBy(
        "doc_id"
    )


@register(
    "docs_lang_source_rollup",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
    doc="Corpus composition rollup (language × source).",
)
def docs_lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("lang", "source")
    )


@register(
    "docs_quality_scores",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CAST(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) AS DOUBLE) AS avg_token_len,
           (length(text) >= 100 AND
            (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) >= 20) AS passes_quality
    FROM documents ORDER BY doc_id
    """,
    doc="Quality scoring: length/token heuristics as pushed-down column "
    "expressions; boolean gate for filtering at scale.",
)
def docs_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_scores(docs).select(
        "doc_id", "n_chars_actual", "n_tokens", "avg_token_len", "passes_quality"
    ).orderBy("doc_id")
