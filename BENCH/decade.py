"""One-decade-up scaling evidence (VERDICT r5 stretch #7): run the
flagship extraction pipeline on a synthetic x10 corpus (sf1-equivalent,
~105k pages) at 8 pinned cores, recording pages/s and peak memory, and
compare against the same pinned run at x1 (sf0.1).

The x10 input is derived from the driver's sf0.1 documents table (never
written to /root/testdata): 10 copies with doc_id offsets; odd copies
get reverse(text) so the corpus is not 10x-duplicated (same reasoning as
sf_scaling.py) while token counts / page geometry per doc are preserved,
so per-row extraction work is comparable.

Each measurement is a FRESH taskset-pinned subprocess (own JVM), the
extraction timed min-of-RUNS inside it; peak memory is the subprocess
tree's high-water mark (RUSAGE_SELF for the python driver +
RUSAGE_CHILDREN, which captures the JVM).

Run:  PYTHONPATH=. python BENCH/decade.py
Appends one JSON line; summarize in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

# small enough that warc_ts = epoch + doc_id*137s stays a valid datetime
# for every offset copy (10^9 overflowed the timestamp derivation)
OFF = 10**6
CORES = "0-7"
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

_CHILD = r"""
import json, os, resource, sys, tempfile, time
from deepseek_ocr_spark.pipeline.session import build_session
from deepseek_ocr_spark.entry_queries import docs_from_driver_table
from deepseek_ocr_spark.pipeline.extract_job import extract_documents

sf_dir, runs = sys.argv[1], int(sys.argv[2])
spark = build_session("decade", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs_path = tempfile.mkdtemp(prefix="decade_docs_") + "/docs"
docs_from_driver_table(spark, sf_dir).write.parquet(docs_path)
docs = spark.read.parquet(docs_path)
extracted = extract_documents(docs)
best = float("inf")
for _ in range(runs):
    t0 = time.time()
    extracted.write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
row = extract_documents(docs).selectExpr(
    "sum(n_pages) AS pages", "count(*) AS docs").collect()[0]

def tree_hwm_kb():
    # high-water RSS of this process plus every live descendant (the JVM
    # and pyspark workers) — RUSAGE_CHILDREN alone misses processes not
    # yet reaped, which is exactly the still-running JVM
    me, pids, total = str(os.getpid()), {str(os.getpid())}, 0
    grew = True
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
    while grew:
        grew = False
        for pid, (ppid, _st) in ppids.items():
            if ppid in pids and pid not in pids:
                pids.add(pid)
                grew = True
    for pid in pids:
        st = ppids.get(pid, (None, None))[1]
        if st and "VmHWM" in st:
            total += int(st["VmHWM"].strip().split()[0])
    return total

peak_kb = tree_hwm_kb()  # self + JVM + live pyspark workers, summed HWM
spark.stop()
print(json.dumps({
    "sec": round(best, 3),
    "pages": int(row["pages"]),
    "docs": int(row["docs"]),
    "pages_per_sec": round(int(row["pages"]) / best, 1),
    "peak_rss_mb": round(peak_kb / 1024, 1),
}))
"""


def synthesize_xn(src: str, dst: str, copies: int) -> None:
    """`copies` offset copies of the driver docs; odd copies get
    reverse(text) so the corpus is never n-x-duplicated.  doc_id offsets
    stay small enough that warc_ts = epoch + id*137s remains a valid
    datetime even at x100 (~year 2454)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM '{src}/documents.parquet'"
    )
    parts = []
    for k in range(copies):
        text = "reverse(text)" if k % 2 else "text"
        parts.append(
            f"SELECT doc_id + {k * OFF} AS doc_id, {text} AS text,"
            " lang, source, n_chars FROM t"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO"
        f" '{dst}/documents.parquet' (FORMAT PARQUET)"
    )


def pinned_run(sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        ["taskset", "-c", CORES, sys.executable, "-c", _CHILD,
         sf_dir, str(RUNS)],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd="/root/repo",
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    levels = [
        int(x) for x in os.environ.get("DECADE_LEVELS", "1,10,100").split(",")
    ]
    out = {}
    for lv in levels:
        if lv == 1:
            out["x1"] = pinned_run(src)
            continue
        with tempfile.TemporaryDirectory(prefix=f"decade_x{lv}_") as d:
            synthesize_xn(src, d, lv)
            out[f"x{lv}"] = pinned_run(d)
    for lv in levels[1:]:
        out[f"slope_x{lv}"] = round(out[f"x{lv}"]["sec"] / out["x1"]["sec"], 3)
    print(json.dumps(out))
    with open("BENCH/decade_r6.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
