"""Document sources (SURVEY.md O-1/O-2 scan analogs).

The reference scans a directory of files (glob.glob(INPUT_PATH/*),
run_dpsk_ocr_eval_batch.py:99-107). The Spark-native equivalents:

- ``load_documents_parquet``  — the standard columnar path (input_hint shape)
- ``load_documents_dir``      — ``binaryFile`` datasource over a directory of
  html files: path→url, content→html; modificationTime→warc_ts. Used for
  raw-crawl drops that haven't been tabularized yet.
- ``load_documents_iceberg``  — Iceberg catalog table, gated behind a
  try/except since the sandbox has no Iceberg runtime jars; on a real
  cluster this is the primary path (north_rule: Iceberg tables of
  Common-Crawl-style pages) and inherits snapshot isolation + partition
  pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def load_documents_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_documents_dir(spark: SparkSession, path: str, glob: str = "*.html") -> DataFrame:
    """Directory of html files → input_hint shape.

    binaryFile pushes the pathGlobFilter down to file listing; content is
    read lazily per split, so column pruning applies if html is unused.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def load_documents_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table path — raises a clear error when the runtime lacks the
    Iceberg jars (this sandbox); the call shape is the production contract."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as exc:  # pragma: no cover - no iceberg jars in sandbox
        raise RuntimeError(
            "Iceberg runtime not available in this environment; add "
            "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages "
            "and configure a catalog (spark.sql.catalog.*)"
        ) from exc
