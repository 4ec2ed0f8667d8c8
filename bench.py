"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship extraction pipeline (reported also as pages/sec —
the BASELINE.md metric) plus the heavier operator families (dedup, similarity,
text quality). Session startup is excluded from per-query timings; each
query is collected once (count/collect action) after a warmup of the input
scan.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    from deepseek_ocr_spark.entry_queries import (
        docs_from_driver_table,
        queries as registry,
    )
    from deepseek_ocr_spark.pipeline.extract_job import extract_documents
    from deepseek_ocr_spark.pipeline.session import build_session

    spark = build_session(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the scan path (parquet footer reads, Python worker pool spin-up)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}

    # flagship: full extraction pipeline over a MATERIALIZED documents table
    # (input derivation is setup, not engine throughput), timed via a noop
    # write of ALL columns — an aggregate-only action would let Catalyst
    # prune the finalize stage and under-measure.
    import tempfile

    # noisy-VM robustness (same reasoning as BENCH/scaling.py): external
    # interference only ever SLOWS a run, so each query is timed BENCH_RUNS
    # times (default 4) and the minimum is reported. r5: min-of-4 applies to
    # EVERY query, not just sub-second ones — r4 recorded ×1.49/×1.36
    # "regressions" on 1s-range queries whose modules had not changed (the
    # VM swings 0.68–1.18×); min-of-2 is not evidence at any duration.
    n_runs = int(os.environ.get("BENCH_RUNS", "4"))

    def timed(action) -> float:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            action()
            best = min(best, time.time() - t0)
        return round(best, 3)

    docs_path = tempfile.mkdtemp(prefix="bench_docs_") + "/docs"
    docs_from_driver_table(spark, sf_dir).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    extracted = extract_documents(docs)
    extract_sec = timed(
        lambda: extracted.write.format("noop").mode("overwrite").save()
    )
    timings["extract_pipeline"] = extract_sec
    # page/doc counters via the pruned fast path (not timed)
    row = extract_documents(docs).selectExpr(
        "sum(n_pages) as pages", "count(*) as docs", "sum(n_vision_tokens) as vt"
    ).collect()[0]
    pages = int(row["pages"] or 0)

    bench_queries = [
        "tile_plan_argmin",
        "dedup_exact",
        "dedup_minhash_pairs",
        "dedup_minhash_pairs_16x4",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "similarity_topk",
        "similarity_ann_lsh",
        "similarity_ann_lsh_256",
        "similarity_ann_ivf",
        "langid_heuristic",
        "quality_score",
        "token_count",
        "doc_fingerprint",
        "ngram_repeat_flags",
        "ordered_assembly",
        "events_hourly",
        "sessionize",
        "asof_join_orders",
        "tpch_pricing_summary",
        "tpch_revenue_topn",
        "tpch_star_region_rollup",
        "semi_join_open_orders",
        "salted_hot_key_join",
        "corpus_clean",
        "daily_active_users",
        # round 3 additions: sketch/index layer + increment job + ANN quality
        "hll_distinct_texts",
        "tfidf_top_terms",
        "inverted_index",
        "dedup_incremental",
        "similarity_ann_recall",
        # round 4: the O(log n)-round components path + quality/sketch adds
        "dedup_components_logstar",
        "repetition_signals",
        "bloom_membership",
        "dedup_lines_global",
        "gopher_quality_flags",
        # round 5: training-data pipeline ops
        "pii_scrub",
        "contamination_3gram",
        "seq_pack",
        # round 6: multimodal/audio/video lanes (r5 ops, first timing rows)
        "multimodal_features",
        "audio_meta",
        "audio_frame_energy",
        "video_meta",
        # round 6: substring-level dedup (detect + apply) + bigram-LM filter
        "dedup_spans",
        "dedup_spans_cut",
        "lm_bigram_score",
        "bpe_top_pairs",
        "dedup_survivors",
        "latest_event_per_user",
        # round 7: trained IVF codebook, batched all-vectors ANN,
        # multi-iteration BPE training loop, full SemDeDup
        "ann_ivf_trained",
        "ann_ivf_topk_all",
        "bpe_merges",
        "dedup_semantic",
        "lm_ppl_buckets",
        "mixture_weights",
        "bpe_encode_stats",
        "dsir_select",
        "quality_clf_scores",
    ]
    reg = registry()
    for name in bench_queries:
        df = reg[name](spark, sf_dir)
        # noop write of ALL columns — .count() would let Catalyst prune the
        # aggregate/computed columns out of the measured plan (CLAUDE.md)
        timings[name] = timed(
            lambda df=df: df.write.format("noop").mode("overwrite").save()
        )

    # true-PDF layout sink probe over a DETERMINISTIC 10% of docs (urls
    # ending in '0').  The synthetic pixmaps are MATERIALIZED first — they
    # are the sandbox stand-in for real page renders, i.e. input
    # derivation, not engine throughput (same rule as the docs table
    # above); the timed plan is the sink itself: page prep (verbatim
    # PNG-IDAT/JPEG passthrough) + per-doc assembly, one url shuffle.
    # 10% keeps the row from dominating the bench; the name says it is a
    # subset so the cap is never silent.
    from pyspark.sql import functions as F

    from deepseek_ocr_spark.pipeline.pdfsink import (
        annotated_pdf_docs,
        synthetic_page_pixmaps,
    )

    sub = extract_documents(docs.filter(F.col("url").endswith("0")))
    pix_path = tempfile.mkdtemp(prefix="bench_pix_") + "/pages"
    synthetic_page_pixmaps(sub).write.parquet(pix_path)
    pages_df = spark.read.parquet(pix_path)
    pdfs = annotated_pdf_docs(pages_df, sub)
    timings["layouts_pdf_10pct"] = timed(
        lambda: pdfs.write.format("noop").mode("overwrite").save()
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": pages,
        "docs": int(row["docs"]),
        "vision_tokens": int(row["vt"] or 0),
        "pages_per_sec": round(pages / extract_sec, 2) if extract_sec > 0 else 0.0,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


if __name__ == "__main__":
    main()
