"""Deterministic synthetic `documents` corpus (FIXTURES.md §1).

Schema fixed by BASELINE.json input_hint:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Size skew is intentional (exercises bucketing/salting, the Gundam dynamic-
tiling analog of vllm/process/image_process.py:45-83): per ``i % 20`` →
14 small single-page docs, 4 medium, 1 large multi-page (up to 12 pages),
1 oversized (up to 40 pages).

Everything is keyed off sha256(seed, i) → Mersenne Twister, so the corpus is
byte-stable across runs and Python versions. No external data.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone

VOCAB = (
    "data spark page table scan filter join merge sort window batch stream "
    "token layout markdown column row group query vector hash index block "
    "document extract compress encode decode tile crop pad grid span label "
    "anchor figure caption header body section title content value metric"
).split()

LANGS = ["en", "zh", "de", "fr", "es"]

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _rng(seed: int, i: int, salt: str = "") -> random.Random:
    h = hashlib.sha256(f"{seed}:{i}:{salt}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    s = _words(rng, rng.randint(6, 18))
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(2, 5)))


def _bbox(rng: random.Random, y_lo: int, y_hi: int) -> str:
    x1 = rng.randint(0, 200)
    x2 = rng.randint(700, 999)
    y1 = rng.randint(y_lo, max(y_lo, y_hi - 30))
    y2 = min(999, y1 + rng.randint(20, 80))
    return f"{x1},{y1},{x2},{y2}"


def _boilerplate(rng: random.Random) -> str:
    return (
        f"<nav><ul><li>Home</li><li>{_words(rng, 2)}</li><li>About</li></ul></nav>"
        f"<header><h1>SiteHeader {_words(rng, 3)}</h1></header>"
        f'<div class="sidebar-promo"><p>{_words(rng, 12)}</p></div>'
    )


def _footer(rng: random.Random) -> str:
    return f"<footer><p>© 2025 {_words(rng, 4)}</p></footer>"


def _page_div(rng: random.Random, page_no: int, degenerate: bool) -> str:
    # page pixel dims: mix of tile-planner regimes
    dims = rng.choice(
        [
            (620, 620),      # small → crop bypass (proc.py:363-364)
            (1024, 1448),    # portrait A4-ish → tiled
            (1920, 1080),    # landscape → tiled
            (1280, 640),     # wide 2:1
            (640, 1280),     # tall 1:2
            (800, 2400),     # extreme aspect
        ]
    )
    w, h = dims
    attrs = f'class="page" data-page="{page_no}" data-width="{w}" data-height="{h}"'
    if degenerate:
        return f"<div {attrs} data-degenerate=\"1\"><p>loop loop loop</p></div>"

    blocks: list[str] = []
    y = 10
    blocks.append(f'<h1 data-bbox="{_bbox(rng, y, y + 60)}">{_words(rng, 5).title()}</h1>')
    y += 90
    n_sections = rng.randint(1, 4)
    for _s in range(n_sections):
        blocks.append(f'<h2 data-bbox="{_bbox(rng, y, y + 50)}">{_words(rng, 4).title()}</h2>')
        y = min(900, y + 60)
        para = _paragraph(rng)
        # sprinkle cascade-exercising literals (FIXTURES.md §3c)
        roll = rng.random()
        if roll < 0.15:
            para += r" \[ E = mc^2 \quad (" + str(rng.randint(1, 9)) + r") \]"
        elif roll < 0.25:
            para += r" Define \coloneqq here and \eqqcolon there."
        elif roll < 0.32:
            para += " <center>centered claim</center>"
        blocks.append(f'<p data-bbox="{_bbox(rng, y, y + 120)}">{para}</p>')
        y = min(900, y + 130)
        extra = rng.random()
        if extra < 0.2:
            items = "".join(f"<li>{_words(rng, 4)}</li>" for _ in range(rng.randint(2, 5)))
            blocks.append(f'<ul data-bbox="{_bbox(rng, y, y + 80)}">{items}</ul>')
            y = min(900, y + 90)
        elif extra < 0.3:
            rows = "".join(
                "<tr>" + "".join(f"<td>{_words(rng, 2)}</td>" for _ in range(3)) + "</tr>"
                for _ in range(rng.randint(2, 4))
            )
            head = "<tr>" + "".join(f"<th>c{k}</th>" for k in range(3)) + "</tr>"
            blocks.append(f'<table data-bbox="{_bbox(rng, y, y + 100)}">{head}{rows}</table>')
            y = min(900, y + 110)
        elif extra < 0.38:
            blocks.append(f'<pre data-bbox="{_bbox(rng, y, y + 60)}">x = {rng.randint(0, 99)}\ny = x * 2</pre>')
            y = min(900, y + 70)
        elif extra < 0.5:
            blocks.append(f'<img data-bbox="{_bbox(rng, y, y + 150)}" alt="fig"/>')
            y = min(900, y + 160)
    blocks.append(f'<aside><p>related {_words(rng, 8)}</p></aside>')
    return f"<div {attrs}>" + "".join(blocks) + "</div>"


def n_pages_for(i: int, rng: random.Random) -> tuple[int, str]:
    """FIXTURES.md size classes by i % 20 → (n_pages, size_class)."""
    c = i % 20
    if c < 14:
        return 1, "small"
    if c < 18:
        return rng.randint(2, 4), "medium"
    if c < 19:
        return rng.randint(6, 12), "large"
    return rng.randint(20, 40), "oversized"


def gen_document(i: int, seed: int = 42) -> dict:
    rng = _rng(seed, i)
    n_pages, size_class = n_pages_for(i, rng)
    pages = []
    for p in range(n_pages):
        prng = _rng(seed, i, f"page{p}")
        # one degenerate (no-EOS) page per ~15 multi-page docs
        degenerate = n_pages > 1 and p == n_pages - 1 and i % 15 == 4
        pages.append(_page_div(prng, p, degenerate))
    brng = _rng(seed, i, "boiler")
    html = (
        "<html><head><title>doc {}</title><meta charset=\"utf-8\"/></head><body>".format(i)
        + _boilerplate(brng)
        + "".join(pages)
        + _footer(brng)
        + "</body></html>"
    )
    # `text` = raw visible dump incl. boilerplate (pre-extraction)
    import re as _re

    visible = _re.sub(r"<[^>]+>", " ", html)
    visible = " ".join(visible.split())
    return {
        "url": f"https://site{i % 97}.example/page/{i}",
        "warc_ts": EPOCH + timedelta(seconds=i * 137),
        "html": html.encode("utf-8"),
        "text": visible,
        "lang": LANGS[i % 5],
    }


def gen_documents(n_docs: int, seed: int = 42) -> list[dict]:
    return [gen_document(i, seed) for i in range(n_docs)]


# ---------------------------------------------------------------------------
# Driver-table bridge: deterministically wrap the driver's plain-text
# documents table (doc_id, text, lang, …) into the html-page input shape
# required by BASELINE.json input_hint. Used by __spark_entry__.entry() and
# bench.py so the extraction pipeline consumes the DRIVER's parquet as its
# source of truth at every scale factor.
# ---------------------------------------------------------------------------


PAGE_DIMS = [(620, 620), (1024, 1448), (1920, 1080), (1280, 640), (800, 2400)]


def _page_div_from_words(
    rng: random.Random,
    page_no: int,
    words: list[str],
    dims: tuple[int, int] | None = None,
) -> str:
    w, h = dims if dims is not None else rng.choice(PAGE_DIMS)
    attrs = f'class="page" data-page="{page_no}" data-width="{w}" data-height="{h}"'
    blocks = []
    y = 10
    title = " ".join(words[:4]).title() or f"Page {page_no}"
    blocks.append(f'<h1 data-bbox="{_bbox(rng, y, y + 60)}">{title}</h1>')
    y += 90
    body = words[4:]
    chunk = max(10, len(body) // 3) if body else 0
    k = 0
    while k < len(body):
        para = " ".join(body[k : k + chunk])
        blocks.append(f'<p data-bbox="{_bbox(rng, y, y + 120)}">{para}</p>')
        y = min(900, y + 130)
        k += chunk
    return f"<div {attrs}>" + "".join(blocks) + "</div>"


def driver_page_count(doc_id: int) -> int:
    """Pages per driver doc — CLOSED FORM so the driver's DuckDB oracle can
    re-derive it in SQL (entry_queries.EXTRACT_SUMMARY_SQL). Size-skew
    classes mirror FIXTURES.md (doc_id % 20): 14 single-page, 4 medium,
    1 large, 1 oversized."""
    c = doc_id % 20
    if c < 14:
        return 1
    if c < 18:
        return 2 + (doc_id // 20) % 2
    return 6 if c < 19 else 12


def driver_page_dims(doc_id: int, page_no: int) -> tuple[int, int]:
    """Per-page dims — CLOSED FORM index into PAGE_DIMS (SQL parity as
    above); covers small-page bypass (620×620), tall/wide/huge aspects."""
    return PAGE_DIMS[(doc_id * 7 + page_no * 3) % 5]


def driver_row_to_html(doc_id: int, text: str, seed: int = 42) -> bytes:
    """One driver documents row → deterministic synthetic page HTML.

    Page COUNT and DIMS are closed-form functions of doc_id/page_no (above)
    so n_pages / n_vision_tokens of the extraction output are exactly
    re-derivable in the driver's DuckDB oracle; the page CONTENT stays
    rng-derived (its invariant is byte-identity vs the shared-kernel oracle,
    gated in pytest, not SQL)."""
    n_pages = driver_page_count(doc_id)
    words = text.split()
    per_page = max(1, (len(words) + n_pages - 1) // n_pages)
    pages = []
    for p in range(n_pages):
        prng = _rng(seed, doc_id, f"driverpage{p}")
        pages.append(
            _page_div_from_words(
                prng, p, words[p * per_page : (p + 1) * per_page],
                dims=driver_page_dims(doc_id, p),
            )
        )
    brng = _rng(seed, doc_id, "driverboiler")
    html = (
        f'<html><head><title>doc {doc_id}</title></head><body>'
        + _boilerplate(brng)
        + "".join(pages)
        + _footer(brng)
        + "</body></html>"
    )
    return html.encode("utf-8")
