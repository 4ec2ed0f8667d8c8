"""Plan-level proof of the storage-side scale mechanics: bucketed co-located
joins (zero exchange), partition-pruned scans, and AQE's skew-join split
actually engaging on a skewed shuffle join."""

import re
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.sources.layout import (
    drop_table,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.01"


@contextmanager
def confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """orders ⋈ lineitem on orderkey, both bucketed by the key: the
    sort-merge join must run with ZERO Exchange — the write-time layout
    already co-located both sides, so no network shuffle happens at all.
    (A within-partition Sort remains: Spark's reader deliberately does not
    trust write-side sortBy order — SPARK-19256 lineage — so only the
    exchange is eliminated; the sort over already-nearly-sorted bucket
    files is cheap and spill-safe.)"""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "t_orders_b", str(tmp_path / "ob"), "o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", str(tmp_path / "lb"), "o_orderkey",
    )
    try:
        with confs(
            spark,
            **{
                "spark.sql.adaptive.enabled": "false",  # static plan for counting
                "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
            },
        ):
            j = (
                spark.table("t_orders_b")
                .join(spark.table("t_lineitem_b"), "o_orderkey")
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = _plan(j)
            smj = plan.count("SortMergeJoin")
            # no exchange below the join: both sides stream straight from
            # the co-located bucket files (SelectedBucketsCount in scan)
            join_part = plan.split("SortMergeJoin", 1)[1]
            assert smj == 1, plan
            assert "Exchange" not in join_part, join_part
            assert "SelectedBucketsCount" in join_part, join_part
            # and the result is still right
            assert j.agg(F.sum("n")).collect()[0][0] == lineitem.count()

            # control: the same join over plain parquet DOES exchange both sides
            pj = orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            assert "Exchange" in _plan(pj)
    finally:
        drop_table(spark, "t_orders_b")
        drop_table(spark, "t_lineitem_b")


def test_partition_pruning(spark, tmp_path):
    """Filter on the partition column must become a PartitionFilter (prunes
    directories at planning time), not a post-scan predicate."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, "lang")

    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    q = spark.read.parquet(path).filter(F.col("lang") == langs[0]).select("doc_id")
    plan = _plan(q)
    assert re.search(r"PartitionFilters: \[.*lang.*\]", plan), plan
    want = docs.filter(F.col("lang") == langs[0]).count()
    assert q.count() == want


def test_aqe_skew_join_split_engages(spark):
    """A pathologically skewed shuffle join must trigger AQE's skew split
    (the runtime half of skew handling; the write-time half is the explicit
    salting in operators/relational.salted_hot_key_join)."""
    # fact: 120k rows, 96% on key 0
    fact = spark.range(120_000).select(
        F.when(F.col("id") % 25 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(120_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    with confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        j = fact.join(dim, "k").select(F.sum(F.length("payload")).alias("s"))
        j.collect()  # AQE decisions materialize during execution
        final_plan = _plan(j)
    assert "skew=true" in final_plan, final_plan[-3000:]
