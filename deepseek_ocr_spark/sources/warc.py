"""WARC + JSONL document sources — the Common-Crawl ingestion formats
(north_rule: "Iceberg tables of Common-Crawl-style web pages"; before the
tabularization step, CC ships WARC files and derived JSONL).

``load_documents_warc`` parses uncompressed WARC 1.0 response records with
pure Catalyst string expressions — no Python on the data path:

  wholetext scan → split on the record boundary "\\r\\n\\r\\nWARC/1.0\\r\\n"
  → keep WARC-Type: response → header fields via regexp_extract → payload =
  bytes after the HTTP header block (the second CRLFCRLF).

Scale note: one WARC file is one row under ``wholetext`` — correct for CC's
~1 GB .warc segments only if executors have the memory; at production scale
this reader targets the UNcompressed re-chunked drops (CC's raw .warc.gz
needs a gzip-splitting input format, which is a JVM datasource concern, not
an engine-semantics one — documented, not stubbed: the parse logic below is
the same either way).

``load_documents_jsonl`` is the schema-on-read path with PERMISSIVE mode: a
corrupt line lands in ``_corrupt_record`` instead of failing the scan
(hostile-corpus rule), and the explicit schema keeps the scan single-pass
(no inference job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REC_SEP = "\r\n\r\nWARC/1.0\r\n"
_HDR_BODY_SEP = "\r\n\r\n"


def load_documents_warc(spark: SparkSession, path: str, glob: str = "*.warc") -> DataFrame:
    """Directory of uncompressed .warc files → input_hint shape
    (url, warc_ts, html, text, lang); only WARC-Type: response records.

    Record anatomy handled: ``WARC/1.0\\r\\n<warc headers>\\r\\n\\r\\n
    <http headers>\\r\\n\\r\\n<payload>\\r\\n\\r\\n`` — records split on the
    terminator+next-version-line boundary, payload taken as the third
    CRLFCRLF-delimited segment (limit-3 split so payload-internal blank
    lines survive), trailing record terminator trimmed."""
    files = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    # regex: literal CRLFCRLF + version line (dot escaped); a leading
    # CRLFCRLF is prepended so the FIRST record also matches the boundary
    boundary = "\r\n\r\nWARC/1\\.0\r\n"
    recs = files.select(
        F.explode(
            F.split(F.concat(F.lit("\r\n\r\n"), F.col("value")), boundary)
        ).alias("rec")
    ).filter(F.col("rec") != "")
    parts = F.split(F.col("rec"), "\r\n\r\n", 3)
    hdr = F.element_at(parts, 1)
    html = F.regexp_replace(
        F.element_at(parts, 3), r"(\r\n)+$", ""
    )  # trim the record terminator
    is_response = hdr.contains("WARC-Type: response")
    uri = F.regexp_extract(hdr, r"WARC-Target-URI:\s*(\S+)", 1)
    date = F.regexp_extract(hdr, r"WARC-Date:\s*(\S+)", 1)
    return (
        recs.filter(is_response & (uri != "") & (F.size(parts) >= 3))
        .select(
            uri.alias("url"),
            F.to_timestamp_ntz(date).alias("warc_ts"),
            F.encode(html, "UTF-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampNTZType()),
        T.StructField("html", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def load_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL drop → input_hint shape; corrupt lines survive the scan in
    ``_corrupt_record`` (quarantine-able) instead of failing the job."""
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return raw.select(
        "url",
        "warc_ts",
        F.encode(F.coalesce(F.col("html"), F.lit("")), "UTF-8").alias("html"),
        "text",
        "lang",
        "_corrupt_record",
    )
