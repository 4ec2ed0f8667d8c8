"""Regenerate docs/QUERIES.md from entry_queries.REGISTRY.

Usage: python docs/gen_queries_index.py
Keeps the index and the registry in lockstep (VERDICT r2 flagged the
hand-maintained count drifting stale).
"""

from __future__ import annotations

import inspect
import re
from pathlib import Path

from deepseek_ocr_spark import entry_queries
from deepseek_ocr_spark.operators import (  # noqa: F401 — resolved via getattr
    corpus_stats,
    dedup,
    multimodal,
    ngram_window,
    relational,
    similarity,
    temporal,
    textops,
    tiling_relational,
)

MODULES = {
    "corpus_stats": corpus_stats,
    "dedup": dedup,
    "multimodal": multimodal,
    "ngram_window": ngram_window,
    "relational": relational,
    "similarity": similarity,
    "temporal": temporal,
    "textops": textops,
    "tiling_relational": tiling_relational,
}


def _summary_for(fn) -> str:
    doc = inspect.getdoc(fn)
    if not doc:
        # lambda: find the first module.function( call in its source
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        m = re.search(r"(\w+)\.(\w+)\(", src)
        if m and m.group(1) in MODULES:
            doc = inspect.getdoc(getattr(MODULES[m.group(1)], m.group(2), None))
        if not doc:
            # bare function calls imported into entry_queries' namespace
            for name in re.findall(r"\b(\w+)\(", src):
                target = getattr(entry_queries, name, None)
                if callable(target) and inspect.getdoc(target):
                    doc = inspect.getdoc(target)
                    break
    if not doc:
        return "—"
    one = " ".join(doc.split())
    cut = one.find(".")
    if 0 < cut < 180:
        one = one[: cut + 1]
    return one[:180]


def main() -> None:
    lines = [
        "# Query registry index",
        "",
        "Auto-generated from `entry_queries.REGISTRY` by",
        "`python docs/gen_queries_index.py` — every entry is an oracle-checked",
        "(Spark vs DuckDB) query unless marked rows-only.",
        "",
        "| query | oracle | summary |",
        "|---|---|---|",
    ]
    for name, (fn, sql) in entry_queries.REGISTRY.items():
        oracle = "yes" if sql is not None else "rows-only"
        lines.append(f"| `{name}` | {oracle} | {_summary_for(fn)} |")
    n = len(entry_queries.REGISTRY)
    n_oracle = sum(1 for _n, (_f, s) in entry_queries.REGISTRY.items() if s)
    lines += [
        "",
        f"**{n} entries: {n_oracle} oracle-paired, {n - n_oracle} rows-only.**",
        "",
    ]
    Path(__file__).with_name("QUERIES.md").write_text("\n".join(lines))
    print(f"wrote QUERIES.md: {n} entries ({n_oracle} oracle-paired)")


if __name__ == "__main__":
    main()
