"""Physical table layout helpers — the storage-side half of shuffle
elimination at 100 TB (SURVEY.md §4 / north_rule "partitioning handled
explicitly").

- ``write_bucketed``: hash-bucket + sort a table by its join key at write
  time. Two tables bucketed the same way join with ZERO exchange
  (tests/test_physical_layout.py asserts the plan) — at corpus scale this
  converts every recurring orderkey join from a full shuffle of both sides
  into a local merge. A within-partition Sort remains: Spark's reader
  deliberately distrusts write-side sortBy order (SPARK-19256 lineage), but
  sorting already-nearly-sorted bucket files is cheap and spill-safe.
- ``write_partitioned``: directory partitioning for predicate-pruned scans
  (a filter on the partition column reads only matching directories —
  PartitionFilters in the scan node, also plan-asserted).

Bucketing uses the session catalog (``saveAsTable`` + explicit ``path``):
bucket metadata must live in a catalog for the reader to trust it — a bare
parquet directory cannot carry the bucket spec. On a production deployment
the same calls target the Iceberg catalog (sources/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    (
        # one writer task per bucket → one FILE per bucket: with several
        # files per bucket the reader cannot trust per-bucket sort order and
        # reinstates the sort below the merge join (observed)
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
