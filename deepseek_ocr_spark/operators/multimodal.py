"""Multimodal binary-column plumbing (training-data-pipeline op family).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing — schema, batching, mapInPandas signature, partitioning —
is real and tested; the actual codec decode is STUBBED (no image/audio libs
in this container): ``decode_image_meta`` derives deterministic fake
dimensions from the bytes' md5 when ``_HAS_CODECS`` is false, and raises
``NotImplementedError`` from the real-decoder hook.

The fake decode is pure hash arithmetic, so it has an exact DuckDB oracle —
the plumbing is checked end-to-end even though no pixels are decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAS_CODECS = False  # no PIL/cv2/ffmpeg in this container


def _real_decode(data: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "real image decode requires PIL/cv2 — not available in this sandbox; "
        "swap _HAS_CODECS when running on a cluster image with codecs"
    )


def _fake_decode(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: dims from the md5 of the payload."""
    h = hashlib.md5(data).hexdigest()
    width = 64 + ord(h[0]) % 64
    height = 64 + ord(h[1]) % 64
    channels = 1 + ord(h[2]) % 4
    return width, height, channels


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("img_width", T.IntegerType()),
        T.StructField("img_height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    decode = _real_decode if _HAS_CODECS else _fake_decode
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "n_bytes", "img_width", "img_height", "channels")}
        for doc_id, data in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(data)
            w, h, c = decode(data)
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(len(data))
            rows["img_width"].append(w)
            rows["img_height"].append(h)
            rows["channels"].append(c)
        yield pd.DataFrame(rows)


def decode_image_meta(docs: DataFrame) -> DataFrame:
    """documents → per-doc fake-image metadata via mapInPandas over a binary
    payload column (the text bytes stand in for image bytes)."""
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, DECODE_SCHEMA)


DECODE_IMAGE_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       64 + ascii(substr(md5(text), 1, 1)) % 64 AS img_width,
       64 + ascii(substr(md5(text), 2, 1)) % 64 AS img_height,
       1 + ascii(substr(md5(text), 3, 1)) % 4 AS channels
FROM documents
"""
