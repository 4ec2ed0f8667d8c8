"""Hostile-input hardening through the FULL distributed path (not just the
kernel): malformed html, empty bytes, non-UTF8, unbalanced divs — the Spark
pipeline must agree with the oracle on all of them, never crash."""

from hypothesis import given, settings, strategies as st

from deepseek_ocr_spark.kernels.tiling import tile_plan
from deepseek_ocr_spark.oracle.runner import extract_url
from deepseek_ocr_spark.pipeline.extract_job import extract_documents

HOSTILE = [
    ("h://empty", b""),
    ("h://plain", b"just plain text, no tags at all"),
    ("h://unclosed", b"<html><body><div class='page' data-page='0'><p>never closed"),
    ("h://nonutf8", b"\xff\xfe<html><p>\x80\x81</p>"),
    ("h://unbalanced", b'<div class="page" data-page="0"><div><p>deep</p></div>'),
    ("h://shuffled", b'<div class="page" data-page="2"><p>two</p></div>'
                     b'<div class="page" data-page="0"><p>zero</p></div>'
                     b'<div class="page" data-page="1"><p>one</p></div>'),
    ("h://badbbox", b'<div class="page" data-page="0"><p data-bbox="1,2">x</p>'
                    b'<img data-bbox="nope,2,3,4"/></div>'),
    ("h://hugeattr", b'<div class="page" data-page="0" data-width="999999" '
                     b'data-height="1"><p>extreme aspect</p></div>'),
    ("h://gt-in-text", b'<div class="page" data-page="0"><p>a &gt; b and 1 < 2</p></div>'),
]


def test_hostile_inputs_spark_matches_oracle(spark):
    docs = spark.createDataFrame(
        [(u, h) for u, h in HOSTILE], "url string, html binary"
    )
    got = {r["url"]: r for r in extract_documents(docs).collect()}
    for u, h in HOSTILE:
        want = extract_url(u, h)
        assert got[u]["text"] == want["text"], u
        assert got[u]["n_pages"] == want["n_pages"], u


@given(st.integers(1, 10_000_000), st.integers(1, 10_000_000))
@settings(max_examples=300, deadline=None)
def test_tile_plan_fuzz_extreme_dims(w, h):
    nw, nh = tile_plan(w, h)
    assert 1 <= nw * nh <= 6
    if w <= 640 and h <= 640:
        assert (nw, nh) == (1, 1)
