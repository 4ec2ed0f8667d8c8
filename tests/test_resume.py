"""Resume / idempotent-replay test (SURVEY.md §5.2.5, BASELINE.md).

Simulates a mid-run kill: commit a partial run (first half of the corpus),
then resume over the full corpus — the anti-join must process only the
missing urls, and the final deduped output must be byte-identical to the
oracle for every url with no duplicates."""

import pytest

from deepseek_ocr_spark.datagen.synth import gen_documents
from deepseek_ocr_spark.oracle.runner import run_oracle
from deepseek_ocr_spark.pipeline import checkpoint as ckpt
from deepseek_ocr_spark.pipeline.extract_job import extract_documents
from pyspark.sql import functions as F


def test_resume_after_partial_run(spark, docs_df, tmp_path):
    base = str(tmp_path / "out")

    # run 1: "crash" after processing only urls hashing to an arbitrary half
    half = docs_df.filter(F.crc32(F.col("url")) % 2 == 0)
    ckpt.commit_run(extract_documents(half), base, attempt=0)

    # run 2: resume over the FULL corpus
    pending = ckpt.pending_documents(docs_df, base)
    pending_urls = {r["url"] for r in pending.select("url").collect()}
    done_urls = {r["url"] for r in half.select("url").collect()}
    all_urls = {r["url"] for r in docs_df.select("url").collect()}
    assert pending_urls == all_urls - done_urls  # anti-join correctness
    ckpt.commit_run(extract_documents(pending), base, attempt=1)

    final = ckpt.read_extracted_deduped(spark, base)
    rows = final.collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)) == len(all_urls)  # no duplicates

    oracle = {r["url"]: r for r in run_oracle(gen_documents(60))}
    for r in rows:
        assert r["text"] == oracle[r["url"]]["text"], r["url"]
        assert r["digest"] == oracle[r["url"]]["digest"]


def test_replay_is_idempotent(spark, docs_df, tmp_path):
    base = str(tmp_path / "out2")
    sub = docs_df.limit(10)
    ckpt.commit_run(extract_documents(sub), base, attempt=0)
    # replay the same urls (e.g. speculative retry) — dedup keeps one copy
    ckpt.commit_run(extract_documents(sub), base, attempt=1)
    final = ckpt.read_extracted_deduped(spark, base)
    assert final.count() == 10
    raw = spark.read.parquet(ckpt.extracted_path(base))
    assert raw.count() == 20  # both attempts landed; reader dedupes
