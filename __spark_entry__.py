"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship distributed extraction pipeline on
sf0.001 (driver documents table → deterministic html pages → grounded
markdown extraction). ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data op families
(dedup, similarity, text analysis, multimodal plumbing) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full extraction
    pipeline (page split → tile plan → kernel UDF → assembly → metrics)."""
    from deepseek_ocr_spark.entry_queries import q_extract_pipeline

    return q_extract_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deepseek_ocr_spark.entry_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from deepseek_ocr_spark.entry_queries import oracle_sql as _o

    return _o()
