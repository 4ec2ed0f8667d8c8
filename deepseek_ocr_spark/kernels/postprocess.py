"""Post-processing cascades — the byte-exact core (SURVEY.md O-30…O-36).

Reproduces, with identical byte semantics, the three entry-point cascades of
the reference:

- ``eval`` mode — run_dpsk_ocr_eval_batch.py:146-161:
  clean_formula → re_match (ALL spans are "other") → per-span:
  remove span, collapse '\\n\\n\\n\\n'→'\\n\\n' then '\\n\\n\\n'→'\\n\\n',
  strip '<center>'/'</center>'.
- ``pdf``  mode — run_dpsk_ocr_pdf.py:286-317:
  EOS check (SKIP_REPEAT) + strip → image spans → ``![](images/{jdx}_{idx}.jpg)\\n``
  → other spans removed + '\\coloneqq'→':=' + '\\eqqcolon'→'=:' + newline
  collapse, each applied once PER other-span iteration.
- ``image`` mode — run_dpsk_ocr_image.py:238-244:
  image spans → ``![](images/{idx}.jpg)\\n`` → other spans removed + latex
  fixes (NO newline collapse).

Faithfully-kept reference quirks (documented, deliberate):
- the newline-collapse / <center>-strip / latex fixes run once per
  "other"-span match — a page with ZERO other spans gets none of them;
- ``str.replace`` replaces ALL occurrences of a span string, so duplicate
  span texts are rewritten together on first touch;
- eval's ``re_match`` puts image spans in the "other" bucket too (they are
  removed, not substituted).

Pure Python; shared verbatim by the oracle and the Spark pandas UDFs.
"""

from __future__ import annotations

import re

from deepseek_ocr_spark.config import EOS_TOKEN, PAGE_SEP, SKIP_REPEAT

# Grounding-span pattern — reference eval.py:70-71 / image.py:45-46 / pdf.py:121-122.
REF_DET_PATTERN = re.compile(
    r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL
)

FORMULA_PATTERN = re.compile(r"\\\[(.*?)\\\]", re.DOTALL)
QUAD_ANNOTATION = re.compile(r"\\quad\s*\([^)]*\)")

IMAGE_REF_LITERAL = "<|ref|>image<|/ref|>"


def clean_formula(text: str) -> str:
    """Inside every ``\\[...\\]`` block: drop ``\\quad (...)`` annotations,
    strip, re-wrap — reference eval.py:53-68."""

    def process_formula(match: re.Match) -> str:
        formula = QUAD_ANNOTATION.sub("", match.group(1))
        return r"\[" + formula.strip() + r"\]"

    return FORMULA_PATTERN.sub(process_formula, text)


def re_match_all(text: str) -> tuple[list[tuple[str, str, str]], list[str]]:
    """eval-mode matcher — every span is "other" (eval.py:70-79)."""
    matches = REF_DET_PATTERN.findall(text)
    return matches, [m[0] for m in matches]


def re_match_split(
    text: str,
) -> tuple[list[tuple[str, str, str]], list[str], list[str]]:
    """pdf/image-mode matcher — split image vs other spans (pdf.py:120-133)."""
    matches = REF_DET_PATTERN.findall(text)
    images, others = [], []
    for m in matches:
        if IMAGE_REF_LITERAL in m[0]:
            images.append(m[0])
        else:
            others.append(m[0])
    return matches, images, others


def parse_spans(text: str) -> list[dict]:
    """Structured span extraction (O-30/O-31): label + 0-999 virtual-grid
    boxes. The det payload is ``[[x1,y1,x2,y2], ...]`` — the reference
    ``eval()``s it (image.py:60-70); we parse the strict JSON subset."""
    spans = []
    for pos, m in enumerate(REF_DET_PATTERN.finditer(text)):
        label = m.group(2)
        try:
            boxes = _parse_boxes(m.group(3))
        except ValueError:
            continue
        for box in boxes:
            spans.append(
                {
                    "label": label,
                    "x1": box[0],
                    "y1": box[1],
                    "x2": box[2],
                    "y2": box[3],
                    "ord": pos,
                    "start": m.start(),
                    "end": m.end(),
                }
            )
    return spans


def _parse_boxes(payload: str) -> list[list[int]]:
    import json

    boxes = json.loads(payload)
    if not isinstance(boxes, list):
        raise ValueError("det payload not a list")
    out = []
    for b in boxes:
        if not (isinstance(b, list) and len(b) == 4):
            raise ValueError("box not 4 ints")
        out.append([int(v) for v in b])
    return out


def rescale_box(
    x1: int, y1: int, x2: int, y2: int, width: int, height: int
) -> tuple[int, int, int, int]:
    """Virtual 0-999 grid → pixels, int truncation (image.py:97-103)."""
    return (
        int(x1 / 999 * width),
        int(y1 / 999 * height),
        int(x2 / 999 * width),
        int(y2 / 999 * height),
    )


def eos_keep_and_strip(raw: str, skip_repeat: bool = SKIP_REPEAT) -> tuple[bool, str]:
    """SKIP_REPEAT gate — reference pdf.py:289-293. Returns (keep, stripped)."""
    if EOS_TOKEN in raw:
        return True, raw.replace(EOS_TOKEN, "")
    return (not skip_repeat), raw


def clean_page_eval(raw: str) -> str:
    """eval-mode cascade — reference eval.py:153-156."""
    content = clean_formula(raw)
    _, others = re_match_all(content)
    for a_match_other in others:
        content = (
            content.replace(a_match_other, "")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content


def clean_page_pdf(content: str, jdx: int) -> str:
    """pdf-mode cascade for one kept page — reference pdf.py:300-314.
    ``content`` is already EOS-stripped; ``jdx`` is the kept-page ordinal."""
    _, images, others = re_match_split(content)
    for idx, a_match_image in enumerate(images):
        content = content.replace(
            a_match_image, "![](images/" + str(jdx) + "_" + str(idx) + ".jpg)\n"
        )
    for _idx, a_match_other in enumerate(others):
        content = (
            content.replace(a_match_other, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
        )
    return content


def clean_page_image(outputs: str) -> str:
    """image-mode cascade — reference image.py:238-244."""
    _, images, others = re_match_split(outputs)
    for idx, a_match_image in enumerate(images):
        outputs = outputs.replace(a_match_image, "![](images/" + str(idx) + ".jpg)\n")
    for _idx, a_match_other in enumerate(others):
        outputs = (
            outputs.replace(a_match_other, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
        )
    return outputs


def assemble_pages(page_texts: list[str]) -> str:
    """Multi-page fold with separator appended after EVERY page —
    reference pdf.py:296-298, 317 (``contents += content + '\\n<--- Page
    Split --->\\n'``)."""
    out = []
    for t in page_texts:
        out.append(t)
        out.append(PAGE_SEP)
    return "".join(out)
