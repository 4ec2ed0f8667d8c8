"""Lossless JPEG (SOF3, process 14) decode lane.

SPEC DISCIPLINE (same rule as ref_resize_bicubic / the jparith fraction
decoder): the encoder here is an INDEPENDENT transcription of T.81
Annex H — prediction (H.1.2.1), difference-category coding (H.1.2.2,
table H.2), point transform (H.1.1/H.2.2) and restart behaviour (H.2.3)
written from the spec text, sharing no code with kernels/jpeg.py.  The
kernel decoder must reconstruct every stream this encoder emits
bit-exactly; change both together or not at all.

PIL cannot decode SOF3 (it raises), so — exactly like the arithmetic
SOF9/SOF10 lanes — there is no in-sandbox cross-codec and this lane
EXCEEDS the reference pipeline's codec surface.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels import jpeg as jpeg_kernel
from deepseek_ocr_spark.kernels.jpeg import decode_jpeg, decode_jpeg_lossless

# --- independent Annex-H encoder (the spec lane) -----------------------------

# Fixed canonical DC-class table covering all 17 difference categories:
# lengths 2,2,2,3,4,5,...,16 for symbols 0,1,2,3,4,...,16 (Kraft sum
# 3/4 + 1/8 + (1/8 - 2^-16) < 1).  BITS = count of codes per length 1..16.
_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
_VALS = list(range(17))


def _codes() -> dict[int, tuple[int, int]]:
    """Canonical code assignment (C.2): symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(_BITS[l - 1]):
            out[_VALS[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing (B.1.1.5)
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.out)


def _predict(a: int, b: int, c: int, sel: int) -> int:
    # H.1.2.1 table H.1 — transcribed from the spec text, not the kernel
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1


def _encode_diffs(
    planes: list[np.ndarray],
    prec: int,
    sel: int,
    pt: int,
    restart_rows: int,
) -> list[bytes]:
    """Entropy-encode all planes interleaved by sample position; returns
    the list of entropy segments split at restart boundaries (H.2.3:
    prediction resets at each restart as at the start of the scan)."""
    codes = _codes()
    h, w = planes[0].shape
    shifted = [(p.astype(np.int64) >> pt) for p in planes]
    segments: list[bytes] = []
    writer = _BitWriter()
    default = 1 << (prec - pt - 1)
    top = 0
    for r in range(h):
        if restart_rows and r and r % restart_rows == 0:
            segments.append(writer.flush())
            writer = _BitWriter()
            top = r
        for cx in range(w):
            for p in shifted:
                if r == top:
                    px = default if cx == 0 else int(p[r, cx - 1])
                elif cx == 0:
                    px = int(p[r - 1, 0])
                else:
                    px = _predict(
                        int(p[r, cx - 1]), int(p[r - 1, cx]),
                        int(p[r - 1, cx - 1]), sel,
                    )
                d = (int(p[r, cx]) - px) & 0xFFFF
                if d == 32768:  # H.1.2.2: SSSS 16, no appended bits
                    code, ln = codes[16]
                    writer.put(code, ln)
                    continue
                dd = d - 65536 if d > 32768 else d
                t = dd.bit_length() if dd >= 0 else (-dd).bit_length()
                code, ln = codes[t]
                writer.put(code, ln)
                if t:
                    writer.put(dd if dd >= 0 else dd + (1 << t) - 1, t)
    segments.append(writer.flush())
    return segments


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def ref_encode_lossless(
    planes: list[np.ndarray],
    prec: int = 8,
    sel: int = 1,
    pt: int = 0,
    restart_rows: int = 0,
    interleaved: bool = True,
) -> bytes:
    """Assemble a complete SOF3 stream: fixed Huffman table, component
    ids 1..n, 1x1 sampling.  ``restart_rows`` > 0 emits DRI + RSTn every
    that many sample rows; ``interleaved=False`` writes one scan per
    component (only meaningful for multi-component images)."""
    h, w = planes[0].shape
    n = len(planes)
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(_BITS) + bytes(_VALS)
    out += _seg(0xC4, dht)
    if restart_rows:
        out += _seg(0xDD, struct.pack(">H", restart_rows * w))
    sof = struct.pack(">BHHB", prec, h, w, n)
    for cid in range(1, n + 1):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC3, sof)
    groups = [planes] if interleaved else [[p] for p in planes]
    base_cid = 1
    for grp in groups:
        sos = bytes([len(grp)])
        for k in range(len(grp)):
            sos += bytes([base_cid + k, 0x00])
        sos += bytes([sel, 0, pt])
        out += _seg(0xDA, sos)
        segs = _encode_diffs(grp, prec, sel, pt, restart_rows)
        for i, s in enumerate(segs):
            out += s
            if i < len(segs) - 1:
                out += bytes([0xFF, 0xD0 + (i & 7)])
        base_cid += len(grp)
    out += b"\xff\xd9"
    return bytes(out)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# --- hand-built bit-level fixture --------------------------------------------


def test_hand_assembled_micro_stream():
    """2x2 gray, precision 8, predictor 1, hand-computed bits.

    Samples [[100, 101], [102, 103]].  Default prediction 128.
    diffs: 100-128=-28 (cat 5, bits -28+31=3 -> 00011)
           101-100=+1  (cat 1, bit 1)
           102-100=+2  (cat 2, bits 10)     # first col of row 1: Rb
           103-102=+1  (cat 1, bit 1)
    codes (canonical over _BITS): cat0=00, cat1=01, cat2=10, cat3=110,
    cat4=1110, cat5=11110.
    stream: 11110 00011 | 01 1 | 10 10 | 01 1  = 20 bits + 1111 pad
      11110000 11011101 00111111 -> F0 DD 3F
    """
    dht = bytes([0x00]) + bytes(_BITS) + bytes(_VALS)
    sof = struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 1, 0, 0])
    data = (
        b"\xff\xd8"
        + _seg(0xC4, dht)
        + _seg(0xC3, sof)
        + _seg(0xDA, sos)
        + bytes([0xF0, 0xDD, 0x3F])
        + b"\xff\xd9"
    )
    w, h, ncomp, prec, arr = decode_jpeg_lossless(data)
    assert (w, h, ncomp, prec) == (2, 2, 1, 8)
    assert arr[:, :, 0].tolist() == [[100, 101], [102, 103]]
    assert decode_jpeg(data) == (2, 2, 1, bytes([100, 101, 102, 103]))


# --- round-trips against the independent encoder -----------------------------


@pytest.mark.parametrize("sel", [1, 2, 3, 4, 5, 6, 7])
def test_all_predictors_roundtrip_gray8(sel):
    img = _rng(100 + sel).integers(0, 256, (7, 9), np.int64)
    data = ref_encode_lossless([img], prec=8, sel=sel)
    w, h, ncomp, prec, arr = decode_jpeg_lossless(data)
    assert (w, h, ncomp, prec) == (9, 7, 1, 8)
    assert np.array_equal(arr[:, :, 0], img)


@pytest.mark.parametrize("interleaved", [True, False])
def test_three_component_roundtrip(interleaved):
    rng = _rng(7)
    planes = [rng.integers(0, 256, (5, 6), np.int64) for _ in range(3)]
    data = ref_encode_lossless(
        planes, prec=8, sel=4, interleaved=interleaved
    )
    w, h, ncomp, prec, arr = decode_jpeg_lossless(data)
    assert (w, h, ncomp, prec) == (6, 5, 3, 8)
    for k in range(3):
        assert np.array_equal(arr[:, :, k], planes[k])
    # Image-tuple lane: interleaved RGB bytes, components verbatim
    w2, h2, c2, buf = decode_jpeg(data)
    assert (w2, h2, c2) == (6, 5, 3)
    assert np.array_equal(
        np.frombuffer(buf, np.uint8).reshape(5, 6, 3).astype(np.int64), arr
    )


@pytest.mark.parametrize("prec", [2, 4, 12, 16])
def test_deep_and_shallow_precision_roundtrip(prec):
    img = _rng(prec).integers(0, 1 << prec, (6, 5), np.int64)
    data = ref_encode_lossless([img], prec=prec, sel=6)
    w, h, ncomp, got_prec, arr = decode_jpeg_lossless(data)
    assert got_prec == prec
    assert np.array_equal(arr[:, :, 0], img)
    # decode_jpeg display mapping: top 8 bits (deep) / left-shift (shallow)
    w2, h2, c2, buf = decode_jpeg(data)
    shown = np.frombuffer(buf, np.uint8).reshape(6, 5)
    if prec > 8:
        assert np.array_equal(shown, (img >> (prec - 8)).astype(np.uint8))
    else:
        assert np.array_equal(shown, (img << (8 - prec)).astype(np.uint8))


def test_ssss16_and_mod_65536_wraparound():
    """Alternating 0/65535 16-bit samples force |diff| = 32767/32768:
    exercises the SSSS=16 no-appended-bits rule and the modulo-2^16
    reconstruction (H.1.2.2)."""
    img = np.zeros((3, 4), np.int64)
    img[:, 1::2] = 65535
    img[1, 0] = 32768  # Rb-predicted first-column diff of +32768 -> SSSS 16
    data = ref_encode_lossless([img], prec=16, sel=1)
    _, _, _, _, arr = decode_jpeg_lossless(data)
    assert np.array_equal(arr[:, :, 0], img)


def test_point_transform_divides_and_restores():
    img = _rng(3).integers(0, 256, (4, 4), np.int64)
    for pt in (1, 3):
        data = ref_encode_lossless([img], prec=8, sel=5, pt=pt)
        _, _, _, _, arr = decode_jpeg_lossless(data)
        assert np.array_equal(arr[:, :, 0], (img >> pt) << pt)


def test_restart_markers_reset_prediction():
    img = _rng(11).integers(0, 256, (8, 5), np.int64)
    data = ref_encode_lossless([img], prec=8, sel=7, restart_rows=2)
    assert b"\xff\xd0" in data and b"\xff\xd1" in data
    _, _, _, _, arr = decode_jpeg_lossless(data)
    assert np.array_equal(arr[:, :, 0], img)


def test_restart_markers_multi_component():
    rng = _rng(13)
    planes = [rng.integers(0, 256, (6, 3), np.int64) for _ in range(3)]
    data = ref_encode_lossless(planes, prec=8, sel=2, restart_rows=3)
    _, _, _, _, arr = decode_jpeg_lossless(data)
    for k in range(3):
        assert np.array_equal(arr[:, :, k], planes[k])


def test_single_row_and_single_column_images():
    row = _rng(17).integers(0, 256, (1, 8), np.int64)
    col = _rng(19).integers(0, 256, (8, 1), np.int64)
    for img in (row, col):
        data = ref_encode_lossless([img], prec=8, sel=4)
        _, _, _, _, arr = decode_jpeg_lossless(data)
        assert np.array_equal(arr[:, :, 0], img)


# --- hostile-input contract --------------------------------------------------


def test_truncation_raises_value_error_only():
    img = _rng(23).integers(0, 256, (4, 4), np.int64)
    data = ref_encode_lossless([img], prec=8, sel=1)
    for cut in range(2, len(data)):
        try:
            decode_jpeg_lossless(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_mutation_fuzz_raises_value_error_only():
    img = _rng(29).integers(0, 256, (4, 4), np.int64)
    data = bytearray(ref_encode_lossless([img], prec=8, sel=4))
    rng = _rng(31)
    for _ in range(300):
        i = int(rng.integers(2, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg_lossless(bytes(data))
            decode_jpeg(bytes(data))
        except (ValueError, NotImplementedError):
            pass
        data[i] = old


def test_bad_headers_raise():
    img = np.zeros((2, 2), np.int64)
    good = ref_encode_lossless([img], prec=8, sel=1)
    sos = b"\xff\xda\x00\x08\x01\x01\x00\x01\x00\x00"
    assert good.count(sos) == 1
    # predictor 0 is invalid in a lossless scan
    bad = good.replace(sos, sos[:-3] + bytes([0, 0, 0]))
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_lossless(bad)
    # point transform >= precision
    bad = good.replace(sos, sos[:-1] + bytes([8]))
    with pytest.raises(ValueError, match="point transform"):
        decode_jpeg_lossless(bad)
    with pytest.raises(ValueError):
        decode_jpeg_lossless(b"\xff\xd8\xff\xd9")  # no SOF/scan
    # non-row-aligned restart interval is rejected, not guessed
    nra = ref_encode_lossless([np.zeros((4, 4), np.int64)], restart_rows=2)
    i = nra.find(b"\xff\xdd") + 4
    nra = nra[:i] + struct.pack(">H", 7) + nra[i + 2 :]
    with pytest.raises(NotImplementedError, match="row-aligned"):
        decode_jpeg_lossless(nra)


def test_non_jpeg_and_sequential_streams_still_route():
    """SOF3 dispatch must not disturb the sequential path, and the
    lossless API rejects a baseline stream (no SOF3)."""
    from tests.test_pixels import gradient

    baseline = jpeg_kernel.encode_jpeg_baseline(gradient(16, 8, 3))
    assert decode_jpeg(baseline)[:3] == (16, 8, 3)
    with pytest.raises(ValueError):
        decode_jpeg_lossless(baseline)
