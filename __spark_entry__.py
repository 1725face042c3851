"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation query (J4 endpoint
referential integrity, SURVEY.md §2.3) at sf0.001; ``queries()`` /
``oracle_sql()`` expose every declared query from the registry
(``neo4j_enterprise_spark.plans``) for the driver's DuckDB hash-compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neo4j_enterprise_spark.plans import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: endpoint-integrity anti-join violations, summarized."""
    return all_queries()["endpoints_not_in_use"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
