"""PDF document source — text-layer extraction over binary PDF columns
(north_rule: "PDF/layout parse"; kernel: kernels/pdftext.py, pure stdlib).

The triage a 100 TB mixed crawl runs: extract the embedded TEXT LAYER
where one exists (this source, cheap), route image-only/unsupported PDFs
to the rasterize+OCR pipeline (the reference's path — pipeline/extract_job
with a vision kernel). Pages with empty extracted text are the routing
signal.

Arrow-batched mapInPandas, one output row per page (1→many fan-out, same
shape as multimodal.frame_sample); hostile payloads yield zero pages,
never a task failure.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deepseek_ocr_spark.kernels.pdftext import extract_pdf_text

PDF_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _page_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf_batch in batches:
        rows = {"url": [], "page_no": [], "text": []}
        for url, data in zip(pdf_batch["url"], pdf_batch["pdf"]):
            if data is None:
                continue
            for ix, text in enumerate(extract_pdf_text(bytes(data))):
                rows["url"].append(url)
                rows["page_no"].append(ix)
                rows["text"].append(text)
        yield pd.DataFrame(rows) if rows["url"] else pd.DataFrame(
            {k: pd.Series([], dtype=object) for k in rows}
        )


def pdf_pages(docs: DataFrame, url_col: str = "url", pdf_col: str = "pdf") -> DataFrame:
    """(url, binary pdf) → one row per page with the extracted text layer."""
    src = docs.select(F.col(url_col).alias("url"), F.col(pdf_col).alias("pdf"))
    return src.mapInPandas(_page_batches, PDF_PAGES_SCHEMA)


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _escape_html(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _pages_to_html(pages: list[str]) -> bytes:
    """Extracted page texts → the engine's document model: one page div per
    PDF page (the extraction pipeline's splitter consumes exactly this
    shape), one <p> per text line, entities escaped."""
    divs = []
    for p, text in enumerate(pages):
        body = "".join(
            f"<p>{_escape_html(line)}</p>" for line in text.split("\n") if line
        )
        divs.append(f'<div class="page" data-page="{p}">{body}</div>')
    return ("<html><body>" + "".join(divs) + "</body></html>").encode("utf-8")


def _doc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = {"url": [], "warc_ts": [], "html": [], "text": []}
        for url, ts, data in zip(b["url"], b["warc_ts"], b["pdf"]):
            pages = extract_pdf_text(bytes(data)) if data is not None else []
            rows["url"].append(url)
            rows["warc_ts"].append(ts)
            rows["html"].append(_pages_to_html(pages))
            rows["text"].append("\n\n".join(pages))
        out = pd.DataFrame(rows)
        out["lang"] = None
        yield out


def load_documents_pdf(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of .pdf files → input_hint document shape in ONE pass
    (each file is read and parsed exactly once; no shuffle): text = the
    joined text layer, html = the page-div document-model rendering of the
    extracted pages, so the extraction pipeline consumes a PDF drop
    directly (run_extract --input-format pdf) with real per-page fan-out.
    Use pdf_pages for the page-granular table."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("url"),
                F.col("modificationTime").alias("warc_ts"),
                F.col("content").alias("pdf"))
    )
    return raw.mapInPandas(_doc_batches, DOCS_SCHEMA)
