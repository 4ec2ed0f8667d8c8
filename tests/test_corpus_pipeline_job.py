"""The corpus-pipeline spark-submit entry: end-to-end in a subprocess
(own session, as spark-submit would run it) — all sinks written, summary
JSON line sane, clean output matches the registry's corpus_clean."""

import json
import os
import subprocess
import sys


def test_run_corpus_pipeline_job(spark, tmp_path):
    out = str(tmp_path / "cp")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "deepseek_ocr_spark.jobs.run_corpus_pipeline",
         "--output", out, "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=240, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["docs_in"] > 0
    assert 0 < summary["docs_clean"] <= summary["docs_in"]
    assert summary["hll_rel_err"] < 0.1

    for sink in ("clean", "stats", "quality", "bands", "index/tfidf",
                 "index/postings", "pii", "contamination", "packing",
                 "span_digests", "spans_cut", "lm_scores", "index/bpe_pairs",
                 "lm_ppl", "mixture", "index/bpe_merges", "dsir_fit",
                 "dsir", "semantic"):
        df = spark.read.parquet(os.path.join(out, sink))
        assert df.count() > 0, sink

    # the bands sink is the seen-set the streaming near-dup probe consumes
    bands = spark.read.parquet(os.path.join(out, "bands"))
    assert set(bands.columns) == {"doc_id", "band"}

    # r5 training-data sinks carry their op's full schema
    pii = spark.read.parquet(os.path.join(out, "pii"))
    assert set(pii.columns) == {"doc_id", "clean_text", "n_emails", "n_ips",
                                "n_phones"}
    cont = spark.read.parquet(os.path.join(out, "contamination"))
    assert set(cont.columns) == {"doc_id", "n_hits", "contaminated"}
    pack = spark.read.parquet(os.path.join(out, "packing"))
    assert set(pack.columns) == {"doc_id", "shard", "n_tokens", "bin_ix"}

    # clean sink == the oracle-checked corpus_clean over the same input
    from deepseek_ocr_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {r["doc_id"] for r in textops.corpus_clean(docs).collect()}
    got = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "clean")).collect()}
    assert got == want
