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


def load_documents_pdf(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of .pdf files → input_hint document shape: text = the
    page texts joined with the engine's page separator semantics (one doc
    row per file; use pdf_pages for the per-page table)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("url"),
                F.col("modificationTime").alias("warc_ts"),
                F.col("content").alias("pdf"))
    )
    pages = pdf_pages(raw, "url", "pdf")
    assembled = (
        pages.groupBy("url")
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page_no", "text"))
                    ),
                    lambda p: p["text"],
                ),
            ).alias("text"),
        )
    )
    return raw.join(assembled, "url", "left").select(
        "url",
        "warc_ts",
        F.col("pdf").alias("html"),  # the raw payload rides in the binary col
        F.coalesce("text", F.lit("")).alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
