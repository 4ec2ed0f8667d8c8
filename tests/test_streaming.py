"""Streaming smoke (SURVEY.md §2.9): the same extraction plan over a
file-source stream, checkpointed, idempotent, byte-identical to the oracle."""

import pytest

from deepseek_ocr_spark.datagen.synth import gen_documents
from deepseek_ocr_spark.oracle.runner import run_oracle
from deepseek_ocr_spark.pipeline import checkpoint as ckpt
from deepseek_ocr_spark.streaming.stream_job import stream_extract


def test_stream_extract_available_now(spark, tmp_path):
    rows = gen_documents(30)
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    input_dir = str(tmp_path / "in")
    # several files → several micro-batches under maxFilesPerTrigger
    docs.repartition(6).write.parquet(input_dir)

    out_base = str(tmp_path / "out")
    q = stream_extract(
        spark, input_dir, out_base, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(300)

    final = ckpt.read_extracted_deduped(spark, out_base)
    got = {r["url"]: r for r in final.collect()}
    oracle = {r["url"]: r for r in run_oracle(rows)}
    assert set(got) == set(oracle)
    for u in oracle:
        assert got[u]["text"] == oracle[u]["text"], u

    # replay: restarting the stream over the same input adds nothing
    q2 = stream_extract(
        spark, input_dir, out_base, str(tmp_path / "ckpt2"), max_files_per_trigger=3
    )
    q2.awaitTermination(300)
    assert ckpt.read_extracted_deduped(spark, out_base).count() == 30
