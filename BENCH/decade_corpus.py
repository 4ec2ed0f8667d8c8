"""Decade scaling evidence for the CORPUS (LLM-data) pipeline (VERDICT r6
task #6): run the dedup → spans → contamination → pack stage chain at x1
(sf0.1) and x10 on 8 pinned cores, recording PER-STAGE seconds, slopes,
and peak RSS — the same pinned-fresh-JVM methodology as BENCH/decade.py
(which sweeps only the extraction flagship).

Stages (one noop-write timing each, min-of-RUNS):
    dedup_pairs     dedup_minhash_pairs (capped) — the near-dup detect pass
    span_digests    dup_window_table — the materialized digest build
    spans           dedup_spans probing the materialized table
    spans_cut       dedup_spans_cut (apply) against the same table
    contamination   traindata.contamination_flags
    lm_score        corpus_stats.lm_bigram_score
    seq_pack        traindata.seq_pack
    clf_score       traindata.clf_scores against a pre-fitted model
                    (fit timed separately as clf_fit_s — 12 GD rounds)

Run:  PYTHONPATH=. python BENCH/decade_corpus.py
Writes BENCH/decade_corpus_r7.json; summarize in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from decade import CORES, RUNS, synthesize_xn  # noqa: E402  (same dir)

_CHILD = r"""
import json, os, sys, time
from deepseek_ocr_spark.pipeline.session import build_session
from deepseek_ocr_spark.operators import corpus_stats, dedup, traindata

sf_dir, runs = sys.argv[1], int(sys.argv[2])
spark = build_session("decade_corpus", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(8).localCheckpoint())

def timed(df_fn):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)

out = {}
out["dedup_pairs"] = timed(lambda: dedup.dedup_minhash_pairs(docs))
out["span_digests"] = timed(lambda: dedup.dup_window_table(docs))
dup_table = dedup.dup_window_table(docs).localCheckpoint()
out["spans"] = timed(lambda: dedup.dedup_spans(docs, dup_table=dup_table))
out["spans_cut"] = timed(lambda: dedup.dedup_spans_cut(docs, dup_table=dup_table))
out["contamination"] = timed(lambda: traindata.contamination_flags(docs))
out["lm_score"] = timed(lambda: corpus_stats.lm_bigram_score(docs))
out["seq_pack"] = timed(lambda: traindata.seq_pack(docs))
t0 = time.time()
clf_model = traindata.clf_fit(docs)  # 12-step integer GD (eager — runs here)
clf_model.write.format("noop").mode("overwrite").save()
out["clf_fit_s"] = round(time.time() - t0, 3)
out["clf_score"] = timed(lambda: traindata.clf_scores(docs, fit=clf_model))

def tree_hwm_kb():
    pids = {str(os.getpid())}
    ppids = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/status") as f:
                st = dict(line.split(":", 1) for line in f if ":" in line)
            ppids[d] = (st.get("PPid", "").strip(), st)
        except OSError:
            continue
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _st) in ppids.items():
            if ppid in pids and pid not in pids:
                pids.add(pid)
                grew = True
    total = 0
    for pid in pids:
        st = ppids.get(pid, (None, None))[1]
        if st and "VmHWM" in st:
            total += int(st["VmHWM"].strip().split()[0])
    return total

out["peak_rss_mb"] = round(tree_hwm_kb() / 1024, 1)
out["docs"] = docs.count()
spark.stop()
print(json.dumps(out))
"""

STAGES = [
    "dedup_pairs", "span_digests", "spans", "spans_cut",
    "contamination", "lm_score", "seq_pack", "clf_score",
]


def pinned_run(sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        ["taskset", "-c", CORES, sys.executable, "-c", _CHILD,
         sf_dir, str(RUNS)],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd="/root/repo",
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    levels = [
        int(x) for x in os.environ.get("DECADE_LEVELS", "1,10").split(",")
    ]
    out = {}
    for lv in levels:
        if lv == 1:
            out["x1"] = pinned_run(src)
            continue
        with tempfile.TemporaryDirectory(prefix=f"decade_corpus_x{lv}_") as d:
            synthesize_xn(src, d, lv)
            out[f"x{lv}"] = pinned_run(d)
    for lv in levels[1:]:
        out[f"slopes_x{lv}"] = {
            s: round(out[f"x{lv}"][s] / out["x1"][s], 2) for s in STAGES
        }
    print(json.dumps(out, indent=1))
    with open("BENCH/decade_corpus_r7.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
