"""SF-scaling evidence (VERDICT r4 #8): run the full bench query set at
sf0.1 and at a synthetic sf0.2 (exactly 2x rows) and report the per-query
scaling slope t(0.2)/t(0.1) — "linear at 2x" as measured evidence for the
operator set, the way the 2->8-core curve is for the pipeline.

The 2x input is derived from the driver's sf0.1 parquet (never written to
/root/testdata): fact tables are doubled with key offsets so join
relationships stay consistent; dimension tables (region, nation) stay
fixed — dims don't grow with corpus size.  Document text in the copy is
reversed so the new docs are NOT near-duplicates of the originals (an
exact 2x-duplicated corpus would quadruple LSH pair enumeration by
construction and masquerade as superlinear operator cost); token count
and lengths are preserved, so per-row work is comparable.

Run:  PYTHONPATH=. python BENCH/sf_scaling.py
Appends one JSON line with per-query slopes; summarize in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

OFF = 10**9


def synthesize(src: str, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    plans = {
        "region": None,  # dimension: unchanged
        "nation": None,
        "customer": "SELECT c_custkey + {o} AS c_custkey, c_name, c_nationkey, "
                    "c_acctbal, c_mktsegment FROM t",
        "supplier": "SELECT s_suppkey + {o} AS s_suppkey, s_name, s_nationkey, "
                    "s_acctbal FROM t",
        "part": "SELECT p_partkey + {o} AS p_partkey, p_name, p_brand, p_type, "
                "p_size, p_retailprice FROM t",
        "orders": "SELECT o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS "
                  "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
                  "o_orderpriority FROM t",
        "lineitem": "SELECT l_orderkey + {o} AS l_orderkey, l_partkey + {o} AS "
                    "l_partkey, l_suppkey + {o} AS l_suppkey, l_linenumber, "
                    "l_quantity, l_extendedprice, l_discount, l_tax, "
                    "l_returnflag, l_linestatus, l_shipdate FROM t",
        "events": "SELECT event_id + {o} AS event_id, ts, user_id + {o} AS "
                  "user_id, event_type, value, props FROM t",
        # reverse(text): same length/token count, fully decorrelated shingles
        "documents": "SELECT doc_id + {o} AS doc_id, reverse(text) AS text, "
                     "lang, source, n_chars FROM t",
        "embeddings": "SELECT vec_id + {o} AS vec_id, embedding, label FROM t",
    }
    for table, copy_sql in plans.items():
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/{table}.parquet'")
        if copy_sql is None:
            q = "SELECT * FROM t"
        else:
            q = f"SELECT * FROM t UNION ALL {copy_sql.format(o=OFF)}"
        con.execute(f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    base = "/root/testdata/sf0.1"
    scaled_root = tempfile.mkdtemp(prefix="sfscale_")
    scaled = os.path.join(scaled_root, "sf0.2")
    print(f"synthesizing 2x corpus at {scaled} ...", file=sys.stderr)
    synthesize(base, scaled)
    print("bench @ sf0.1 ...", file=sys.stderr)
    r1 = run_bench(base)
    print("bench @ sf0.2 ...", file=sys.stderr)
    r2 = run_bench(scaled)
    slopes = {
        q: round(r2["queries"][q] / r1["queries"][q], 2)
        for q in r1["queries"]
        if q in r2["queries"] and r1["queries"][q] > 0
    }
    out = {
        "bench": "sf_scaling_2x",
        "sf_base": r1["sf"],
        "sf_scaled": r2["sf"],
        "total_base_sec": r1["value"],
        "total_scaled_sec": r2["value"],
        "total_slope": round(r2["value"] / r1["value"], 2),
        "queries_base": r1["queries"],
        "queries_scaled": r2["queries"],
        "slopes": slopes,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
