"""PDF text-layer source: kernel round-trips (Flate + raw, escapes, hex
strings, multi-page), a hand-written raw PDF literal (independent of the
fixture writer), hostile payloads, and the Spark per-page fan-out."""

import zlib

import pytest

from deepseek_ocr_spark.kernels.pdftext import extract_pdf_text, make_simple_pdf


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip_multipage(compress):
    pages = ["Hello world", "Second page\nwith two lines", ""]
    out = extract_pdf_text(make_simple_pdf(pages, compress=compress))
    assert out == pages


def test_pdf_escapes_roundtrip():
    pages = ["parens () and \\ backslash", "tab\tand (nested (deep)) text"]
    got = extract_pdf_text(make_simple_pdf(pages))
    assert got[0] == pages[0]
    assert got[1] == pages[1]


def test_pdf_handwritten_raw_literal():
    """A PDF written by hand in the test (not by make_simple_pdf), with an
    uncompressed stream, a TJ array, a hex string, and an octal escape —
    the parser must not depend on the fixture writer's conventions."""
    content = b"BT (A\\101) Tj [(B) (C)] TJ <4445> Tj T* (next) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["AABCDE\nnext"]


def test_pdf_hostile_never_raises():
    for payload in [
        b"", b"%PDF-1.4", b"not a pdf", b"\x00" * 100,
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 9 0 R >>\nendobj\n",
        # Flate-marked stream with corrupt zlib data
        b"%PDF\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Filter /FlateDecode >>\nstream\n\xde\xad\nendstream\nendobj\n",
        make_simple_pdf(["x"])[:80],  # truncated
    ]:
        out = extract_pdf_text(payload)
        assert isinstance(out, list)


def test_pdf_length_bounds_stream_with_embedded_endstream():
    """Compressed bytes that happen to contain b"\\nendstream" must NOT
    truncate the stream when the dict carries a direct /Length — the bounded
    slice decompresses; the regex fallback would hand zlib a prefix."""
    text = "length bounded page"
    ops = f"BT ({text}) Tj ET".encode()
    comp = None
    # search for a marker-containing compressed body by salting the stream
    for salt in range(20000):
        cand = zlib.compress(ops + b" % pad " + str(salt).encode(), 9)
        if b"\nendstream" in cand:
            comp = cand
            break
    if comp is None:  # build one explicitly: stored (level-0) blocks keep bytes verbatim
        comp = zlib.compress(ops + b" % \nendstream ", 0)
        assert b"\nendstream" in comp
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == [text]


def test_pdf_indirect_length_falls_back_to_regex():
    """/Length as an indirect reference (`5 0 R`) must not be misread as a
    byte count — the parser falls back to the regex scan."""
    content = b"BT (indirect length) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["indirect length"]


def test_pdf_wrong_direct_length_falls_back_to_regex():
    """A direct /Length that does not land on `endstream` is implausible —
    fall back rather than emit a truncated/overlong body."""
    content = b"BT (bad length) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 7 >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["bad length"]


def test_pdf_inline_image_data_skipped():
    """BI…ID <binary>…EI sample data contains stray parens and letters that
    must not be walked as text operators; text on both sides survives."""
    binary = b"\x00(\xff garbage ) Tj fake\x01\x02"
    content = (
        b"BT (before) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID " + binary + b" EI "
        b"BT (after) Tj ET"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["beforeafter"]


def test_pdf_unterminated_inline_image_degrades():
    content = b"BT (kept) Tj ET BI /W 1 ID \x00\x01 no terminator"
    pdf = make_simple_pdf(["placeholder"])  # shape only; build raw below
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["kept"]


def test_pdf_flate_actually_compressed():
    raw = make_simple_pdf(["compressed page"], compress=True)
    assert b"/FlateDecode" in raw and b"compressed page" not in raw
    assert extract_pdf_text(raw) == ["compressed page"]
    assert zlib  # imported for clarity: the only codec involved is stdlib


def test_pdf_pages_spark(spark, tmp_path):
    from deepseek_ocr_spark.sources.pdf import load_documents_pdf, pdf_pages

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(make_simple_pdf(["doc a page 1", "doc a page 2"]))
    (d / "b.pdf").write_bytes(make_simple_pdf(["doc b only page"]))
    (d / "junk.pdf").write_bytes(b"hostile not-a-pdf payload")

    docs = load_documents_pdf(spark, str(d))
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in docs.collect()}
    assert set(rows) == {"a.pdf", "b.pdf", "junk.pdf"}
    assert rows["a.pdf"]["text"] == "doc a page 1\n\ndoc a page 2"
    assert rows["b.pdf"]["text"] == "doc b only page"
    assert rows["junk.pdf"]["text"] == ""  # routing signal for the OCR path
    # html carries the engine's document model (page divs), not raw PDF bytes
    html = bytes(rows["a.pdf"]["html"]).decode()
    assert html.count('class="page"') == 2 and "doc a page 2" in html

    raw = spark.createDataFrame(
        [("a", make_simple_pdf(["p0", "p1", "p2"]))], "url STRING, pdf BINARY"
    )
    got = sorted((r["page_no"], r["text"]) for r in pdf_pages(raw).collect())
    assert got == [(0, "p0"), (1, "p1"), (2, "p2")]
    plan = pdf_pages(raw)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" in plan


def test_pdf_kids_order_overrides_object_numbering():
    """Page order comes from the /Pages /Kids array, not object numbers —
    a merged/edited PDF commonly numbers pages out of display order."""
    c1, c2 = b"BT (FIRST) Tj ET", b"BT (SECOND) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["FIRST", "SECOND"]


def test_run_extract_from_pdf_dir(spark, tmp_path):
    """run_extract --input-format pdf: the TEXT LAYER (not raw PDF bytes)
    flows through the extraction pipeline with real per-page fan-out."""
    import os
    import subprocess
    import sys

    d = tmp_path / "pdf_job_in"
    d.mkdir()
    (d / "doc.pdf").write_bytes(
        make_simple_pdf(["alpha page content", "beta page content"])
    )
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "deepseek_ocr_spark.jobs.run_extract",
         "--input", str(d), "--input-format", "pdf", "--output", out],
        capture_output=True, text=True, timeout=240, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = spark.read.parquet(f"{out}/extracted").collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["n_pages"] == 2
    assert "alpha page content" in row["text"].lower()
    assert "beta page content" in row["text"].lower()
    assert row["text"].count("<--- Page Split --->") == 2
