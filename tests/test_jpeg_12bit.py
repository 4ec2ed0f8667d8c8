"""12-bit DCT JPEG (SOF1 extended sequential / SOF2 progressive).

Spec lanes are the INDEPENDENT scalar transcriptions that already pin
the 8-bit paths — `_ref_idct_1d` (tests/test_jpeg_kernel.py) re-staged
here with the 12-bit center/clamp, a 12-bit re-transcription of the
jdcolor fixed-point math, and the closed-form DC-only islow identity.
Entropy coding is precision-independent, so streams are assembled by
the same hand builders with the SOF precision byte and 16-bit DQT
(Pq=1) swapped in.  PIL cannot decode 12-bit JPEG at all (8-bit builds
of libjpeg reject it), so this lane EXCEEDS the reference pipeline's
codec surface like SOF3/SOF9.
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
    _ref_idct_1d,
    _seg,
    _zz_from_natural,
)

_CONST_BITS, _PASS1_BITS = 13, 2


def ref_idct_islow_12(block64, quant64):
    """The scalar islow reference with the 12-bit sample stage: center
    2048, clamp 0..4095 (independent twin of ref_idct_islow's tail)."""
    deq = [block64[i] * quant64[i] for i in range(64)]
    cols = []
    for c in range(8):
        col = [deq[r * 8 + c] for r in range(8)]
        cols.append(_ref_idct_1d(col, _CONST_BITS - _PASS1_BITS))
    rows = []
    for r in range(8):
        row = [cols[c][r] for c in range(8)]
        rows.append(_ref_idct_1d(row, _CONST_BITS + _PASS1_BITS + 3))
    return [[max(0, min(4095, v + 2048)) for v in row] for row in rows]


def _f16(x: float) -> int:
    return int(round(x * 65536))


def ref_ycc12(y, cb, cr):
    """Independent 12-bit jdcolor transcription (center 2048)."""
    r = y + ((_f16(1.40200) * (cr - 2048) + 32768) >> 16)
    b = y + ((_f16(1.77200) * (cb - 2048) + 32768) >> 16)
    g = y + (
        (-_f16(0.34414) * (cb - 2048) + 32768 + -_f16(0.71414) * (cr - 2048))
        >> 16
    )
    clamp = lambda v: max(0, min(4095, v))
    return clamp(r), clamp(g), clamp(b)


def build_jpeg12(w, h, comps, quants, mcu_blocks, dri=0):
    """12-bit twin of test_jpeg_kernel.build_jpeg: SOF1 marker,
    precision byte 12, DQT stored 16-bit (Pq=1)."""
    out = bytearray(b"\xff\xd8")
    for tq, q in quants.items():
        zz = b"".join(
            struct.pack(">H", q[ZIGZAG[k]]) for k in range(64)
        )
        out += _seg(0xDB, bytes([(1 << 4) | tq]) + zz)
    sof = struct.pack(">BHHB", 12, h, w, len(comps))
    for i, (ch_, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch_ << 4) | cv, tq])
    out += _seg(0xC1, sof)  # SOF1: extended sequential
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    wtr = _W()
    preds = {}
    for m, mcu in enumerate(mcu_blocks):
        for ci, zz in mcu:
            preds[ci] = _emit_block(wtr, zz, preds.get(ci, 0))
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def test_dc_only_12bit_flat_and_display_mapping():
    """DC-only: sample = clamp(2048 + ((dc*q + 4) >> 3), 0, 4095); the
    16-bit DQT path carries q > 255."""
    q = [300] * 64
    for dc in (5, -6, 0, 40, -80):
        blk = [0] * 64
        blk[0] = dc
        data = build_jpeg12(8, 8, [(1, 1, 0)], {0: q},
                            [[(0, _zz_from_natural(blk))]])
        expect = max(0, min(4095, 2048 + ((dc * 300 + 4) >> 3)))
        w, h, ch, prec, arr = decode_jpeg_deep(data)
        assert (w, h, ch, prec) == (8, 8, 1, 12)
        assert set(arr.flatten().tolist()) == {expect}
        w, h, ch, buf = decode_jpeg(data)
        assert set(buf) == {expect >> 4}


def test_ac_blocks_match_scalar_reference_12bit():
    rng = np.random.RandomState(11)
    q = list(rng.randint(1, 600, 64))
    b1, b2 = [0] * 64, [0] * 64
    b1[0], b1[1], b1[8], b1[27] = 60, -13, 7, 2
    b2[0], b2[9], b2[63] = -90, 5, 1
    data = build_jpeg12(
        16, 8, [(1, 1, 0)], {0: q},
        [[(0, _zz_from_natural(b1))], [(0, _zz_from_natural(b2))]],
    )
    w, h, ch, prec, arr = decode_jpeg_deep(data)
    assert (w, h, ch, prec) == (16, 8, 1, 12)
    for bx, blk in enumerate((b1, b2)):
        expect = ref_idct_islow_12(blk, q)
        got = arr[:, bx * 8 : bx * 8 + 8, 0]
        assert got.tolist() == expect


def test_color_flat_12bit_matches_ycc_reference():
    """Three flat DC-only planes → every pixel converts through the
    independent 12-bit jdcolor transcription."""
    q = [16] * 64
    vals = {"y": 90, "cb": -64, "cr": 48}
    blocks = []
    for key in ("y", "cb", "cr"):
        blk = [0] * 64
        blk[0] = vals[key]
        blocks.append(_zz_from_natural(blk))
    data = build_jpeg12(
        8, 8, [(1, 1, 0), (1, 1, 0), (1, 1, 0)], {0: q},
        [[(0, blocks[0]), (1, blocks[1]), (2, blocks[2])]],
    )
    flat = lambda v: max(0, min(4095, 2048 + ((v * 16 + 4) >> 3)))
    y, cb, cr = flat(vals["y"]), flat(vals["cb"]), flat(vals["cr"])
    er, eg, eb = ref_ycc12(y, cb, cr)
    w, h, ch, prec, arr = decode_jpeg_deep(data)
    assert (w, h, ch, prec) == (8, 8, 3, 12)
    assert set(map(tuple, arr.reshape(-1, 3).tolist())) == {(er, eg, eb)}
    # display lane: top 8 bits of each channel
    w, h, ch, buf = decode_jpeg(data)
    assert set(
        map(tuple, np.frombuffer(buf, np.uint8).reshape(-1, 3).tolist())
    ) == {(er >> 4, eg >> 4, eb >> 4)}


def test_progressive_12bit_equals_sequential():
    from tests.test_jpeg_progressive import build_progressive_jpeg, _gray_blocks

    rng = np.random.RandomState(13)
    blocks = _gray_blocks(rng, 4)
    q = [32] * 64
    seq = build_jpeg12(32, 8, [(1, 1, 0)], {0: q},
                       [[(0, zz)] for zz in blocks])
    prog = build_progressive_jpeg(
        32, 8, [(1, 1, 0)], {0: q}, [blocks],
        [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
         ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 0), ([0], 1, 5, 2, 1),
         ([0], 1, 5, 1, 0)],
    )
    # swap the SOF2 precision byte to 12 (entropy layers are unchanged)
    i = prog.index(b"\xff\xc2") + 4
    assert prog[i] == 8
    prog = prog[:i] + bytes([12]) + prog[i + 1 :]
    a = decode_jpeg_deep(seq)
    b = decode_jpeg_deep(prog)
    assert a[:4] == b[:4] == (32, 8, 1, 12)
    assert np.array_equal(a[4], b[4])


def test_deep_api_on_8bit_stream_is_widened_identity():
    from tests.test_jpeg_kernel import build_jpeg

    blk = [0] * 64
    blk[0], blk[5] = 9, -4
    q = [17] * 64
    data = build_jpeg(8, 8, [(1, 1, 0)], {0: q}, [[(0, _zz_from_natural(blk))]])
    w, h, ch, buf = decode_jpeg(data)
    dw, dh, dch, prec, arr = decode_jpeg_deep(data)
    assert (dw, dh, dch, prec) == (w, h, ch, 8)
    assert arr[:, :, 0].astype(np.uint8).tobytes() == buf


def test_12bit_gates_remain():
    """SOF0 must stay 8-bit; 12-bit arithmetic (SOF9) stays gated."""
    q = [16] * 64
    blk = [0] * 64
    data = build_jpeg12(8, 8, [(1, 1, 0)], {0: q},
                        [[(0, _zz_from_natural(blk))]])
    for marker in (0xC0, 0xC9):
        i = data.index(b"\xff\xc1")
        bad = data[:i] + bytes([0xFF, marker]) + data[i + 2 :]
        with pytest.raises(NotImplementedError):
            decode_jpeg(bad)


def test_12bit_mutation_fuzz_value_error_only():
    q = [100] * 64
    blk = [0] * 64
    blk[0], blk[3] = 30, 6
    data = bytearray(
        build_jpeg12(8, 8, [(1, 1, 0)], {0: q}, [[(0, _zz_from_natural(blk))]])
    )
    rng = np.random.default_rng(17)
    for _ in range(300):
        i = int(rng.integers(2, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg_deep(bytes(data))
        except (ValueError, NotImplementedError):
            pass
        data[i] = old
