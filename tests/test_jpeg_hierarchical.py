"""Hierarchical JPEG (Annex J: DHP + EXP + differential SOF5 frames).

Spec lanes, independent of the kernel: the DC-only islow closed form
(sample = center + ((dc·q + 4) >> 3), signed part floor-shifted — the
same identity the 8-bit/12-bit suites pin), a test-side transcription of
the J.1.1.2 reference-expansion filter (`ref_expand`), and the existing
independent YCbCr fixed-point transcription.  Streams are assembled by
hand with the shared table/bit-writer helpers.  PIL cannot decode
hierarchical JPEG at all, so — as with SOF3/SOF9/12-bit — this lane
EXCEEDS the reference pipeline's codec surface.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_deep,
)
from tests.test_jpeg_kernel import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    _W,
    _emit_block,
    _seg,
    _zz_from_natural,
)


def ref_expand(plane, eh, ev):
    """Independent J.1.1.2 transcription: even samples copy, odd samples
    round-to-nearest-mean, trailing odd sample replicates the edge."""
    rows = [list(r) for r in plane]
    if eh:
        out = []
        for r in rows:
            o = []
            for i, v in enumerate(r):
                o.append(v)
                nxt = r[i + 1] if i + 1 < len(r) else r[-1]
                o.append((v + nxt + 1) // 2)
            out.append(o)
        rows = out
    if ev:
        out = []
        for i, r in enumerate(rows):
            nxt = rows[i + 1] if i + 1 < len(rows) else rows[-1]
            out.append(list(r))
            out.append([(a + b + 1) // 2 for a, b in zip(r, nxt)])
        rows = out
    return rows


def _dc_block(dc):
    blk = [0] * 64
    blk[0] = dc
    return _zz_from_natural(blk)


def build_hier(full_w, full_h, frames, prec=8, quants=None, ncomp=1):
    """frames: list of dicts with keys
    marker (0xC0/0xC1/0xC5), w, h, exp ((eh, ev) or None),
    blocks {cid: [zigzag-order blocks in raster order]} — cids 1..ncomp."""
    quants = quants or {0: [16] * 64}
    out = bytearray(b"\xff\xd8")
    for tq, q in quants.items():
        if prec == 8:
            zz = bytes([tq]) + bytes(q[ZIGZAG[k]] for k in range(64))
        else:
            zz = bytes([(1 << 4) | tq]) + b"".join(
                struct.pack(">H", q[ZIGZAG[k]]) for k in range(64)
            )
        out += _seg(0xDB, zz)
    dhp = struct.pack(">BHHB", prec, full_h, full_w, ncomp)
    for cid in range(1, ncomp + 1):
        dhp += bytes([cid, 0x11, 0])
    out += _seg(0xDE, dhp)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    for fr in frames:
        if fr.get("exp"):
            eh, ev = fr["exp"]
            out += _seg(0xDF, bytes([(eh << 4) | ev]))
        sof = struct.pack(">BHHB", prec, fr["h"], fr["w"], len(fr["blocks"]))
        for cid in sorted(fr["blocks"]):
            sof += bytes([cid, 0x11, 0])
        out += _seg(fr["marker"], sof)
        sos = bytes([len(fr["blocks"])])
        for cid in sorted(fr["blocks"]):
            sos += bytes([cid, 0x00])
        sos += b"\x00\x3f\x00"
        out += _seg(0xDA, sos)
        wtr = _W()
        preds = {}
        nmcu = ((fr["w"] + 7) // 8) * ((fr["h"] + 7) // 8)
        for m in range(nmcu):
            for cid in sorted(fr["blocks"]):
                preds[cid] = _emit_block(wtr, fr["blocks"][cid][m], preds.get(cid, 0))
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _flat(dc, q=16, prec=8):
    return max(0, min((1 << prec) - 1, (1 << (prec - 1)) + ((dc * q + 4) >> 3)))


def _diff(dc, q=16):
    return (dc * q + 4) >> 3


def test_two_frame_gray_pyramid_flat():
    """8x8 flat base, EXP(1,1) to 16x16 (flat upsample is the identity
    value-wise), differential frame adds a flat signed delta."""
    v1 = _flat(10)  # 148
    d2 = _diff(-3)  # -6
    data = build_hier(
        16, 16,
        [
            {"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(10)]}},
            {"marker": 0xC5, "w": 16, "h": 16, "exp": (1, 1),
             "blocks": {1: [_dc_block(-3)] * 4}},
        ],
    )
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (16, 16, 1)
    assert set(buf) == {v1 + d2}
    dw, dh, dch, prec, arr = decode_jpeg_deep(data)
    assert (dw, dh, dch, prec) == (16, 16, 1, 8)
    assert set(arr.flatten().tolist()) == {v1 + d2}


def test_expansion_filter_matches_reference_transcription():
    """Base frame = two horizontally adjacent flat blocks (16x8), EXP
    horizontal only → 32x8; the zero differential frame exposes the
    upsampled reference verbatim, checked against ref_expand."""
    a, b = _flat(10), _flat(-6)  # 148, 116
    data = build_hier(
        32, 8,
        [
            {"marker": 0xC0, "w": 16, "h": 8,
             "blocks": {1: [_dc_block(10), _dc_block(-6)]}},
            {"marker": 0xC5, "w": 32, "h": 8, "exp": (1, 0),
             "blocks": {1: [_dc_block(0)] * 4}},
        ],
    )
    w, h, ch, buf = decode_jpeg(data)
    got = list(buf[:32])  # first row
    base_row = [a] * 8 + [b] * 8
    assert got == ref_expand([base_row], 1, 0)[0]
    # interior seam: the odd sample between the flat runs is the mean
    assert got[15] == (a + b + 1) // 2


def test_three_level_pyramid_and_vertical_expansion():
    """8x8 → 16x16 → 32x32: two EXP doublings chained; all-flat so every
    level is hand-computable."""
    data = build_hier(
        32, 32,
        [
            {"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(4)]}},
            {"marker": 0xC5, "w": 16, "h": 16, "exp": (1, 1),
             "blocks": {1: [_dc_block(2)] * 4}},
            {"marker": 0xC5, "w": 32, "h": 32, "exp": (1, 1),
             "blocks": {1: [_dc_block(-1)] * 16}},
        ],
    )
    w, h, ch, buf = decode_jpeg(data)
    expect = _flat(4) + _diff(2) + _diff(-1)
    assert (w, h, ch) == (32, 32, 1)
    assert set(buf) == {expect}


def test_color_hierarchical_flat():
    from tests.test_jpeg_kernel import _f16  # independent fixed-point ycc

    ydc, cbdc, crdc = 20, -8, 6
    frames = [
        {"marker": 0xC0, "w": 8, "h": 8,
         "blocks": {1: [_dc_block(ydc)], 2: [_dc_block(cbdc)],
                    3: [_dc_block(crdc)]}},
    ]
    data = build_hier(8, 8, frames, ncomp=3)
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 3)
    y, cb, cr = _flat(ydc), _flat(cbdc), _flat(crdc)
    r = y + ((_f16(1.40200) * (cr - 128) + 32768) >> 16)
    b = y + ((_f16(1.77200) * (cb - 128) + 32768) >> 16)
    g = y + (
        (-_f16(0.34414) * (cb - 128) + 32768 + -_f16(0.71414) * (cr - 128))
        >> 16
    )
    clamp = lambda v: max(0, min(255, v))
    assert set(
        map(tuple, np.frombuffer(buf, np.uint8).reshape(-1, 3).tolist())
    ) == {(clamp(r), clamp(g), clamp(b))}


def test_differential_clamps_at_range_edges():
    data = build_hier(
        8, 8,
        [
            {"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(-60)]}},
            {"marker": 0xC5, "w": 8, "h": 8, "blocks": {1: [_dc_block(-50)]}},
        ],
    )
    w, h, ch, buf = decode_jpeg(data)
    assert set(buf) == {0}  # 8 + (-100) clamps at 0


def test_12bit_hierarchical():
    q = [300] * 64
    data = build_hier(
        8, 8,
        [
            {"marker": 0xC1, "w": 8, "h": 8, "blocks": {1: [_dc_block(9)]}},
            {"marker": 0xC5, "w": 8, "h": 8, "blocks": {1: [_dc_block(-2)]}},
        ],
        prec=12, quants={0: q},
    )
    dw, dh, dch, prec, arr = decode_jpeg_deep(data)
    expect = _flat(9, q=300, prec=12) + _diff(-2, q=300)
    assert (dw, dh, dch, prec) == (8, 8, 1, 12)
    assert set(arr.flatten().tolist()) == {expect}
    w, h, ch, buf = decode_jpeg(data)
    assert set(buf) == {expect >> 4}


def test_hierarchical_errors():
    good = build_hier(
        16, 16,
        [
            {"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(1)]}},
            {"marker": 0xC5, "w": 16, "h": 16, "exp": (1, 1),
             "blocks": {1: [_dc_block(0)] * 4}},
        ],
    )
    assert decode_jpeg(good)[:3] == (16, 16, 1)
    # differential first frame: no reference
    bad = build_hier(
        8, 8, [{"marker": 0xC5, "w": 8, "h": 8, "blocks": {1: [_dc_block(1)]}}]
    )
    with pytest.raises(ValueError, match="reference"):
        decode_jpeg(bad)
    # final frame below DHP resolution
    bad = build_hier(
        16, 16, [{"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(1)]}}]
    )
    with pytest.raises(ValueError, match="resolution"):
        decode_jpeg(bad)
    # progressive frame inside a hierarchical sequence stays gated
    i = good.index(b"\xff\xc5")
    with pytest.raises(NotImplementedError, match="hierarchical"):
        decode_jpeg(good[:i] + b"\xff\xc6" + good[i + 2 :])


def test_truncation_and_mutation_value_error_only():
    data = bytearray(
        build_hier(
            16, 16,
            [
                {"marker": 0xC0, "w": 8, "h": 8, "blocks": {1: [_dc_block(7)]}},
                {"marker": 0xC5, "w": 16, "h": 16, "exp": (1, 1),
                 "blocks": {1: [_dc_block(1)] * 4}},
            ],
        )
    )
    for cut in range(2, len(data)):
        try:
            decode_jpeg(bytes(data[:cut]))
        except (ValueError, NotImplementedError):
            pass
    rng = np.random.default_rng(41)
    for _ in range(300):
        i = int(rng.integers(2, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(data))
        except (ValueError, NotImplementedError):
            pass
        data[i] = old
