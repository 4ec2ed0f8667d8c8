"""Single-node oracle pipeline (SURVEY.md §5.2.2).

Mirrors the control flow of the reference's batch entry point
(run_dpsk_ocr_pdf.py:241-331 — scan → page render → inference → SKIP_REPEAT
filter → per-page cascade → ordered fold), with the deterministic extraction
kernel standing in for the model. Explicit Python loops, no Spark: this is
the ground truth the distributed engine must match byte-for-byte per url.
"""

from __future__ import annotations

import hashlib

from deepseek_ocr_spark.config import EngineConfig, DEFAULT_CONFIG
from deepseek_ocr_spark.kernels.extract import extract_document
from deepseek_ocr_spark.kernels.postprocess import (
    assemble_pages,
    clean_page_eval,
    clean_page_image,
    clean_page_pdf,
    eos_keep_and_strip,
    parse_spans,
    rescale_box,
)
from deepseek_ocr_spark.kernels.tiling import tile_plan
from deepseek_ocr_spark.kernels.tokens import num_text_tokens, num_vision_tokens


def extract_url(url: str, html: bytes | str, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """One document end-to-end → the `extracted` row (FIXTURES.md §2).
    None/bytes html normalization happens inside the shared kernel."""
    pages = extract_document(html)

    raw_parts: list[str] = []
    clean_parts: list[str] = []
    spans: list[dict] = []
    page_dims: list[dict] = []  # kept pages, in assembly order
    vision_tokens = 0
    n_pages_kept = 0
    jdx = 0  # kept-page ordinal (pdf.py:285, incremented at pdf.py:320)

    for page in pages:
        keep, content = eos_keep_and_strip(page["raw"], cfg.skip_repeat)
        if not keep:
            continue
        n_pages_kept += 1
        page_dims.append(
            {"page_no": page["page_no"], "width": page["width"], "height": page["height"]}
        )
        nw, nh = tile_plan(
            page["width"], page["height"], cfg.crop_mode,
            cfg.image_size, cfg.min_crops, cfg.max_crops,
        )
        vision_tokens += num_vision_tokens(nw, nh, cfg.base_size, cfg.image_size)
        raw_parts.append(content)

        for s in parse_spans(content):
            s["page_no"] = page["page_no"]
            s["px1"], s["py1"], s["px2"], s["py2"] = rescale_box(
                s["x1"], s["y1"], s["x2"], s["y2"], page["width"], page["height"]
            )
            spans.append(s)

        if cfg.mode == "eval":
            clean = clean_page_eval(content)
        elif cfg.mode == "image":
            clean = clean_page_image(content)
        else:
            clean = clean_page_pdf(content, jdx)
        clean_parts.append(clean)
        jdx += 1

    raw_text = assemble_pages(raw_parts)
    text = assemble_pages(clean_parts)
    text_tokens = num_text_tokens(text)
    return {
        "url": url,
        "text": text,
        "raw_text": raw_text,
        "spans": spans,
        "page_dims": page_dims,
        "n_pages": n_pages_kept,
        "n_vision_tokens": vision_tokens,
        "n_text_tokens": text_tokens,
        "compression_ratio": (text_tokens / vision_tokens) if vision_tokens else 0.0,
        "digest": hashlib.sha256(text.encode("utf-8")).hexdigest(),
    }


def run_oracle(rows: list[dict], cfg: EngineConfig = DEFAULT_CONFIG) -> list[dict]:
    """documents rows (url, html, ...) → extracted rows, single-threaded."""
    return [extract_url(r["url"], r["html"], cfg) for r in rows]
