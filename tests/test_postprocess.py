"""Byte-exact cascade tests (FIXTURES.md §3c/3d) — reproduce the observable
behavior of the reference's three entry-point cascades, including the quirks
(per-other-span application of the newline collapse; eval removing image
spans; pdf jdx ordinals)."""

from deepseek_ocr_spark.config import EOS_TOKEN, PAGE_SEP
from deepseek_ocr_spark.kernels.postprocess import (
    assemble_pages,
    clean_formula,
    clean_page_eval,
    clean_page_image,
    clean_page_pdf,
    eos_keep_and_strip,
    parse_spans,
    rescale_box,
)

SPAN_T = "<|ref|>title<|/ref|><|det|>[[12,34,567,890]]<|/det|>"
SPAN_I = "<|ref|>image<|/ref|><|det|>[[1,2,3,4]]<|/det|>"


def test_clean_formula():
    # eval.py:53-68: drop \quad (...) inside \[...\], strip, re-wrap
    assert clean_formula(r"\[ E=mc^2 \quad (1) \]") == r"\[E=mc^2\]"
    assert clean_formula(r"pre \[  a+b \] post") == r"pre \[a+b\] post"
    assert clean_formula("no formula") == "no formula"


def test_eval_cascade_removes_all_spans_and_collapses():
    raw = SPAN_T + "\n# Title\n\n\n\n<center>x</center>"
    out = clean_page_eval(raw)
    assert "<|ref|>" not in out
    assert "\n\n\n" not in out
    assert "<center>" not in out and "</center>" not in out
    assert "# Title" in out


def test_eval_cascade_no_other_spans_no_collapse():
    # quirk: zero spans → the collapse/center-strip never runs (eval.py:155)
    raw = "a\n\n\n\nb<center>c</center>"
    assert clean_page_eval(raw) == raw


def test_eval_removes_image_spans_too():
    raw = SPAN_I + "\nrest"
    out = clean_page_eval(raw)
    assert "<|ref|>" not in out
    assert "![](" not in out  # eval mode never substitutes


def test_pdf_cascade_image_substitution_ordinals():
    raw = SPAN_I + "\nmid\n" + SPAN_T + "\n# T\n"
    out = clean_page_pdf(raw, jdx=3)
    assert "![](images/3_0.jpg)\n" in out
    assert "<|ref|>" not in out
    assert "\\coloneqq" not in out


def test_pdf_latex_fixes_require_other_span():
    # the latex replaces happen inside the other-span loop (pdf.py:313-314)
    raw_with = SPAN_T + r"\n x \coloneqq y"
    assert ":=" in clean_page_pdf(raw_with, 0)
    raw_without = r"x \coloneqq y"
    assert clean_page_pdf(raw_without, 0) == raw_without


def test_image_cascade_no_newline_collapse():
    raw = SPAN_T + "\na\n\n\n\nb"
    out = clean_page_image(raw)
    assert "\n\n\n\n" in out  # image.py:243 has no newline collapse
    assert "<|ref|>" not in out


def test_image_mode_image_ordinal_no_jdx():
    raw = SPAN_I + "x" + SPAN_I.replace("1,2,3,4", "5,6,7,8")
    out = clean_page_image(raw)
    assert "![](images/0.jpg)\n" in out
    assert "![](images/1.jpg)\n" in out


def test_eos_gate():
    keep, s = eos_keep_and_strip("body" + EOS_TOKEN)
    assert keep and s == "body"
    keep, s = eos_keep_and_strip("repeat repeat", skip_repeat=True)
    assert not keep
    keep, s = eos_keep_and_strip("repeat repeat", skip_repeat=False)
    assert keep and s == "repeat repeat"


def test_parse_spans_and_rescale():
    spans = parse_spans(SPAN_T + " and " + SPAN_I)
    assert [s["label"] for s in spans] == ["title", "image"]
    s0 = spans[0]
    assert (s0["x1"], s0["y1"], s0["x2"], s0["y2"]) == (12, 34, 567, 890)
    # image.py:99-103: int truncation of x/999*dim
    assert rescale_box(0, 0, 999, 999, 1280, 960) == (0, 0, 1280, 960)
    assert rescale_box(12, 34, 567, 890, 1000, 500) == (12, 17, 567, 445)


def test_multibox_span():
    spans = parse_spans("<|ref|>t<|/ref|><|det|>[[1,2,3,4],[5,6,7,8]]<|/det|>")
    assert len(spans) == 2
    assert spans[0]["ord"] == spans[1]["ord"] == 0


def test_assembly_separator_after_every_page():
    # pdf.py:296-298: content + '\n' + '\n<--- Page Split --->' + '\n'
    out = assemble_pages(["p1", "p2"])
    assert out == "p1" + PAGE_SEP + "p2" + PAGE_SEP
    assert PAGE_SEP == "\n\n<--- Page Split --->\n"


def test_cleanup_idempotent_on_cleaned():
    raw = SPAN_T + "\n# Title\n\n\n\ntext"
    once = clean_page_eval(raw)
    assert clean_page_eval(once) == once
