"""Minimal pure-stdlib PDF text extraction (north_rule: "PDF/layout parse").

The reference rasterizes PDF pages and OCRs them (run_dpsk_ocr_pdf.py via
fitz + the vision model); this module is the complementary TEXT-LAYER path
a training-data pipeline runs first — extract embedded text where it
exists, rasterize+OCR only the rest. Like kernels/pixels.py, it is an
honest documented SUBSET with zero native deps:

  SUPPORTED: classic (non-stream) xref PDFs; objects `N 0 obj … endobj`;
  page content streams raw or /FlateDecode (zlib is stdlib); text operators
  Tj, ' (quote), TJ arrays; literal `(…)`-strings with \\-escapes and octal;
  hex `<…>`-strings (byte-per-2-hex); newline on Td/TD/T*/'.
  NOT supported (returns what it can, never raises): xref streams
  (PDF 1.5+ compressed object streams), CID/Type0 multi-byte encodings,
  encryption. A hostile or unsupported payload yields fewer/empty pages,
  not an exception — the same quarantine rule as every other source.

Determinism: pure byte scanning + zlib; identical output on every
executor, so the extracted text column is safe to hash for dedup.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# direct /Length only — the ([0-9\s]*R) lookahead rejects indirect
# references like `/Length 8 0 R` (and any backtracked digit prefix)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9\s]*R)")
# inline-image data terminator: whitespace-delimited EI
_EI_RE = re.compile(rb"\sEI(?=\s|$)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)


def _ordered_page_nums(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in DISPLAY order: DFS over the /Pages /Kids
    tree (object numbering is arbitrary after edits/merges — /Kids order
    is the document order). Pages unreachable from any tree (or documents
    with no /Pages node at all) fall back to object-number order."""
    page_nums = {n for n, b in objs.items() if _PAGE_RE.search(b)}
    pages_nodes = {n for n, b in objs.items() if _PAGES_RE.search(b)}
    kids_of: dict[int, list[int]] = {}
    referenced: set[int] = set()
    for n in pages_nodes:
        m = _KIDS_RE.search(objs[n])
        kids = [int(k.group(1)) for k in _REF_RE.finditer(m.group(1))] if m else []
        kids_of[n] = kids
        referenced.update(k for k in kids if k in pages_nodes)
    order: list[int] = []
    seen: set[int] = set()

    def dfs(n: int) -> None:
        if n in seen:
            return
        seen.add(n)
        if n in page_nums:
            order.append(n)
        for k in kids_of.get(n, []):
            dfs(k)

    for root in sorted(pages_nodes - referenced):
        dfs(root)
    for n in sorted(page_nums):
        if n not in seen:
            order.append(n)
    return order


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _stream_of(body: bytes) -> bytes | None:
    """Stream body, bounded by the dict's direct /Length when present and
    consistent (compressed bytes may legitimately contain "\\nendstream",
    which would truncate the non-greedy regex scan); falls back to the
    regex for missing/indirect/implausible lengths — degrade, don't raise."""
    sm = _STREAM_START_RE.search(body)
    if sm is None:
        return None
    start = sm.end()
    raw = None
    lm = _LENGTH_RE.search(body[: sm.start()])
    if lm:
        length = int(lm.group(1))
        cand = body[start : start + length]
        tail = body[start + length : start + length + 16]
        if len(cand) == length and re.match(rb"\s*endstream", tail):
            raw = cand
    if raw is None:
        m = _STREAM_RE.search(body)
        if m is None:
            return None
        raw = m.group(1)
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _content_refs(page_body: bytes) -> list[int]:
    arr = _CONTENTS_ARR_RE.search(page_body)
    if arr:
        return [int(m.group(1)) for m in _REF_RE.finditer(arr.group(1))]
    one = _CONTENTS_RE.search(page_body)
    return [int(one.group(1))] if one else []


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _literal_string(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a `(…)` literal starting at s[i] == '('; returns (bytes, next)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = s[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and s[j : j + 1].isdigit():
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop backslash
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out += c
        i += 1
    return bytes(out), i


def _hex_string(s: bytes, i: int) -> tuple[bytes, int]:
    j = s.index(b">", i)
    hx = re.sub(rb"\s", b"", s[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _extract_stream_text(content: bytes) -> str:
    """Walk text-showing operators in one content stream."""
    parts: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _literal_string(content, i)
            pending.append(s)
            continue
        if c == b"<" and content[i + 1 : i + 2] != b"<":
            try:
                s, i = _hex_string(content, i)
            except ValueError:
                break
            pending.append(s)
            continue
        if c.isalpha() or c in (b"'", b'"'):
            j = i
            while j < n and (content[j : j + 1].isalpha() or content[j : j + 1] in (b"*", b"'", b'"')):
                j += 1
            op = content[i:j]
            if op == b"BI":
                # inline image: binary sample data between ID and a
                # whitespace-delimited EI would otherwise be walked as text
                # operators (stray parens → garbage strings). Skip the whole
                # section; unterminated data ends the stream walk.
                id_pos = content.find(b"ID", j)
                if id_pos == -1:
                    break
                ei = _EI_RE.search(content, id_pos + 2)
                if ei is None:
                    break
                pending.clear()
                i = ei.end()
                continue
            if op in (b"Tj", b"TJ"):
                parts.extend(s.decode("latin-1") for s in pending)
            elif op in (b"'", b'"'):
                parts.append("\n")
                parts.extend(s.decode("latin-1") for s in pending)
            elif op in (b"Td", b"TD", b"T*"):
                if parts:
                    parts.append("\n")
            pending.clear()
            i = j
            continue
        if c in b")>":  # stray closers on malformed input
            i += 1
            continue
        i += 1
    return "".join(parts)


def extract_pdf_text(data: bytes) -> list[str]:
    """PDF bytes → per-page extracted text (see module docstring for the
    supported subset). Unsupported/hostile input degrades to fewer or
    empty pages; never raises."""
    try:
        objs = _objects(data)
        pages = []
        for num in _ordered_page_nums(objs):
            body = objs[num]
            texts = []
            for ref in _content_refs(body):
                stream = _stream_of(objs.get(ref, b""))
                if stream:
                    texts.append(_extract_stream_text(stream))
            pages.append("".join(texts))
        return pages
    except Exception:
        return []


# --- fixture writer (tests + datagen; kept here so writer and parser ----------
# --- stay in one reviewable module) -------------------------------------------


def make_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """A minimal valid PDF with one content stream per page — Flate or raw.
    Text is emitted line-by-line with Tj + Td so the parser's newline rule
    round-trips."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(pages):
        content_ref = 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_ref} 0 R >>".encode()
        )
        lines = text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append("0 -14 Td")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        if compress:
            comp = zlib.compress(stream)
            objs.append(
                f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + comp + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(stream)} >>".encode()
                + b"\nstream\n" + stream + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
