"""inverted_index postings bound (VERDICT r4 #6): a viral (stopword-like)
token must not materialize an unbounded posting list — `max_postings`
slices the sorted array AFTER the single-shuffle aggregation while `df`
still reports the true distinct-doc count."""

import pyspark.sql.functions as F

from deepseek_ocr_spark.operators import corpus_stats


def _viral_docs(spark, n=200):
    # every doc contains the viral token "the"; doc i also has a unique token
    rows = [(i, f"the uniq{i}", "en", "src0", 10) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_max_postings_truncates_viral_token(spark):
    docs = _viral_docs(spark, 200)
    idx = corpus_stats.inverted_index(docs, min_df=3, max_postings=5)
    row = idx.filter(F.col("token") == "the").collect()[0]
    assert row["df"] == 200  # true frequency survives the cap
    assert row["postings"] == [0, 1, 2, 3, 4]  # first 5 sorted ids only


def test_max_postings_none_is_uncapped(spark):
    docs = _viral_docs(spark, 50)
    idx = corpus_stats.inverted_index(docs, min_df=3)
    row = idx.filter(F.col("token") == "the").collect()[0]
    assert row["df"] == 50 and len(row["postings"]) == 50


def test_csv_variant_emits_scalar_string(spark):
    docs = _viral_docs(spark, 20)
    idx = corpus_stats.inverted_index_csv(docs, min_df=3, max_postings=4)
    row = idx.filter(F.col("token") == "the").collect()[0]
    assert row["postings"] == "0,1,2,3"
    assert dict(idx.dtypes)["postings"] == "string"


def test_cap_is_post_agg_slice_one_exchange(spark):
    """The size filter / slice must NOT recompute the aggregation — the
    whole index build stays a single token-key exchange."""
    docs = _viral_docs(spark, 20)
    plan = (
        corpus_stats.inverted_index(docs, min_df=3, max_postings=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
