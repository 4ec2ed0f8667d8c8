"""QM arithmetic coder (kernels/jparith.py) + arithmetic JPEG lanes.

Validation design: no arithmetic-capable codec exists in-sandbox (PIL
cannot decode SOF9/SOF10 either), so the spec here is TWO independent
lanes that must agree with the fast coder:

1. ``_ExactRefDecoder`` — an exact-arithmetic reference that tracks the
   unstuffed bitstream as one big-integer fraction and the interval
   base exactly.  It has NO C register, NO renormalization windows, NO
   byte-boundary carry machinery and NO flush logic, so a bug anywhere
   in that plumbing (the risky part of a QM implementation) cannot
   cancel out between the fast encoder and fast decoder.
2. Huffman parity — the arithmetic and Huffman encoders share the DCT /
   quantization front half, and entropy coding is lossless, so the
   arithmetic encode of an image must decode to pixels BYTE-IDENTICAL
   to the Huffman encode's decode (which is itself pinned against an
   independent scalar transcription + PIL in test_jpeg_kernel.py).

Change the module and these lanes together or not at all (the
ref_resize_bicubic rule).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from deepseek_ocr_spark.kernels import jparith
from deepseek_ocr_spark.kernels.jparith import (
    QE_TABLE,
    ArithDecoder,
    ArithEncoder,
    fixed_stats,
    new_stats,
)
from deepseek_ocr_spark.kernels.jpeg import (
    decode_jpeg,
    encode_jpeg_arith,
    encode_jpeg_baseline,
)


class _ExactRefDecoder:
    """Exact-arithmetic QM reference decoder.

    The unstuffed bitstream is consumed one bit per renormalization into
    a growing big integer V (plus a 16-bit preload); the interval base B
    is tracked exactly at scale 2^(16+S) where S counts renorm shifts.
    The decision is the exact comparison V >= B + (A - Qe) — by
    construction V always holds exactly 16+S bits, at which precision
    the floor comparison equals the real-number comparison.  Only the
    Qe table and the MPS/LPS conditional-exchange rules are shared with
    the fast lanes; everything register-shaped is different.
    """

    def __init__(self, data: bytes):
        bits: list[int] = []
        i = 0
        while i < len(data):
            b = data[i]
            if b == 0xFF:
                if i + 1 < len(data) and data[i + 1] == 0x00:
                    i += 2  # stuffed zero: deliver the 0xFF data byte
                else:
                    break  # marker: end of entropy data
            else:
                i += 1
            bits.extend((b >> k) & 1 for k in range(7, -1, -1))
        self.bits = bits
        self.k = 0
        self.v = 0
        self.s = 0
        self.base = 0
        self.a = 0x10000
        for _ in range(16):
            self._pull()

    def _pull(self) -> None:
        b = self.bits[self.k] if self.k < len(self.bits) else 0
        self.k += 1
        self.v = (self.v << 1) | b

    def decode(self, st: bytearray, i: int) -> int:
        while self.a < 0x8000:
            self.a <<= 1
            self.base <<= 1
            self.s += 1
            self._pull()
        assert self.k == 16 + self.s  # exactness precondition
        sv = st[i]
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        a1 = self.a - qe
        if self.v >= self.base + a1:
            # top subinterval (size Qe)
            self.base += a1
            self.a = qe
            if a1 < qe:
                bit = sv >> 7
                st[i] = (sv & 0x80) | nmps
            else:
                bit = (sv >> 7) ^ 1
                st[i] = (((sv ^ 0x80) if sw else sv) & 0x80) | nlps
        else:
            self.a = a1
            if a1 < 0x8000:
                if a1 < qe:
                    bit = (sv >> 7) ^ 1
                    st[i] = (((sv ^ 0x80) if sw else sv) & 0x80) | nlps
                else:
                    bit = sv >> 7
                    st[i] = (sv & 0x80) | nmps
            else:
                bit = sv >> 7
        return bit


def _roundtrip(bits: list[int], bins: list[int], nbins: int):
    """Encode the (bit, bin) stream, decode with BOTH lanes, return
    (stream, fast_bits, ref_bits, fast_states, ref_states, carries)."""
    enc = ArithEncoder()
    st = new_stats(nbins)
    for b, i in zip(bits, bins):
        enc.encode(st, i, b)
    stream = enc.flush()

    st_fast = new_stats(nbins)
    dec = ArithDecoder(stream, 0)
    fast = [dec.decode(st_fast, i) for i in bins]

    st_ref = new_stats(nbins)
    ref = _ExactRefDecoder(stream)
    got = [ref.decode(st_ref, i) for i in bins]
    return stream, fast, got, bytes(st_fast), bytes(st_ref), enc.carries


def test_coder_roundtrip_and_exact_reference_fuzz():
    """Random adaptive streams: the fast decoder AND the exact-arithmetic
    reference must both reproduce the encoded bits and end in identical
    adaptation states.  The corpus must actually exercise byte stuffing
    (0xFF in the stream) and carry resolution."""
    rng = random.Random(0xA31)
    total_ff = 0
    total_carries = 0
    for trial in range(150):
        n = rng.randrange(20, 500)
        nbins = rng.choice([1, 2, 8])
        bins = [rng.randrange(nbins) for _ in range(n)]
        p = rng.choice([0.02, 0.1, 0.5, 0.9, 0.98])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        stream, fast, ref, s_fast, s_ref = _roundtrip(bits, bins, nbins)[:5]
        assert fast == bits, f"fast decoder mismatch (trial {trial})"
        assert ref == bits, f"exact reference mismatch (trial {trial})"
        assert s_fast == s_ref
        total_ff += stream.count(0xFF)
        _, _, _, _, _, carries = _roundtrip(bits, bins, nbins)
        total_carries += carries
    assert total_ff > 0, "fuzz corpus never produced a stuffed 0xFF"
    assert total_carries > 0, "fuzz corpus never exercised carry ripple"


def test_coder_carry_stress_patterns():
    """Deterministic adversarial patterns: long MPS runs at slow-attack
    states push C toward all-ones so carries and FF stacking occur."""
    for pattern in (
        [1] * 400 + [0] + [1] * 400,
        ([1] * 63 + [0]) * 30,
        [0] * 300 + [1] * 300,
        ([1, 0] * 200) + [1] * 100,
    ):
        bins = [0] * len(pattern)
        stream, fast, ref, s_fast, s_ref, _ = _roundtrip(pattern, bins, 1)
        assert fast == pattern
        assert ref == pattern
        assert s_fast == s_ref


def test_fixed_bin_never_adapts():
    enc = ArithEncoder()
    fx = fixed_stats()
    seq = [0, 1, 1, 0, 1, 0, 0, 1] * 20
    for b in seq:
        enc.encode(fx, 0, b)
        assert fx[0] == jparith.FIXED_BIN  # state byte untouched
    stream = enc.flush()
    fx2 = fixed_stats()
    dec = ArithDecoder(stream, 0)
    assert [dec.decode(fx2, 0) for _ in seq] == seq
    assert fx2[0] == jparith.FIXED_BIN


def test_qe_table_invariants():
    assert len(QE_TABLE) == 114
    for idx, (qe, nlps, nmps, sw) in enumerate(QE_TABLE):
        assert 0 < qe < 0x8000
        assert 0 <= nlps < 114 and 0 <= nmps < 114
        assert sw in (0, 1)
        if sw:
            # the MPS sense only flips near p=0.5
            assert qe > 0x5000, idx
    # state 0 must reach the most-skewed state (Qe=1) along MPS wins
    seen = set()
    i = 0
    while i not in seen:
        seen.add(i)
        i = QE_TABLE[i][2]
    assert any(QE_TABLE[j][0] == 0x0001 for j in seen)


def test_decoder_feeds_zeros_past_marker():
    """A truncated entropy segment must still decode (zero feed), never
    hang or index out of bounds."""
    enc = ArithEncoder()
    st = new_stats(1)
    bits = [1, 0, 1, 1, 0, 0, 1] * 40
    for b in bits:
        enc.encode(st, 0, b)
    stream = enc.flush()
    for cut in (0, 1, 2, len(stream) // 2):
        dec = ArithDecoder(stream[:cut] + b"\xff\xd9", 0)
        st2 = new_stats(1)
        out = [dec.decode(st2, 0) for _ in bits]  # must terminate
        assert len(out) == len(bits)


# --- JPEG integration --------------------------------------------------------


def _rand_img(w: int, h: int, ch: int, seed: int):
    r = np.random.RandomState(seed)
    return (w, h, ch, r.randint(0, 256, (h, w, ch), dtype=np.uint8).tobytes())


@pytest.mark.parametrize(
    "desc,img,kw",
    [
        ("rgb-seq", _rand_img(24, 17, 3, 7), {}),
        ("gray-seq", _rand_img(19, 23, 1, 1), {}),
        ("rgb-prog", _rand_img(33, 26, 3, 2), {"progressive": True}),
        ("gray-prog", _rand_img(16, 16, 1, 3), {"progressive": True}),
        ("rgb-dac", _rand_img(24, 24, 3, 4), {"emit_dac": True}),
        ("rgb-rst", _rand_img(40, 32, 3, 5), {"restart_interval": 3}),
        (
            "rgb-prog-rst",
            _rand_img(40, 32, 3, 6),
            {"progressive": True, "restart_interval": 2},
        ),
        (
            "rgb-prog-dac",
            _rand_img(24, 16, 3, 8),
            {"progressive": True, "emit_dac": True},
        ),
        ("tiny-1x1", _rand_img(1, 1, 3, 9), {}),
    ],
)
def test_arith_jpeg_matches_huffman_pixels(desc, img, kw):
    """Entropy coding is lossless: the arithmetic and Huffman encodes of
    one image share the DCT front half, so their decodes must be
    byte-identical.  This transitively pins the arithmetic lanes to the
    independently-transcribed Huffman decoder spec."""
    base = encode_jpeg_baseline(img, quality=85)
    ari = encode_jpeg_arith(img, quality=85, **kw)
    assert decode_jpeg(ari) == decode_jpeg(base)
    marker = 0xCA if kw.get("progressive") else 0xC9
    assert bytes([0xFF, marker]) in ari
    if kw.get("emit_dac"):
        assert b"\xff\xcc" in ari
    if kw.get("restart_interval"):
        assert any(bytes([0xFF, 0xD0 + n]) in ari for n in range(8))


def test_arith_jpeg_deterministic():
    img = _rand_img(20, 20, 3, 42)
    a = encode_jpeg_arith(img, quality=90, progressive=True)
    b = encode_jpeg_arith(img, quality=90, progressive=True)
    assert a == b
    assert decode_jpeg(a) == decode_jpeg(b)


def test_arith_jpeg_smaller_on_smooth_content():
    """The adaptive coder should beat Huffman on smooth gradients (the
    compression advantage arithmetic coding exists for)."""
    w = h = 48
    buf = bytes(bytearray(min(255, x + y) for y in range(h) for x in range(w)))
    img = (w, h, 1, buf)
    assert len(encode_jpeg_arith(img)) < len(encode_jpeg_baseline(img))


def test_arith_jpeg_mutation_fuzz_value_error_only():
    """Hostile-input contract: mutated arithmetic streams raise
    ValueError only (or decode to something) — never IndexError /
    OverflowError / hangs (decode_jpeg's wrapper catches the rest)."""
    img = _rand_img(16, 16, 3, 77)
    for progressive in (False, True):
        data = encode_jpeg_arith(img, quality=85, progressive=progressive)
        rng = random.Random(500 + progressive)
        for _ in range(60):
            b = bytearray(data)
            for _k in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_jpeg(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_arith_jpeg_truncation_degrades():
    img = _rand_img(24, 24, 3, 13)
    data = encode_jpeg_arith(img, quality=85)
    for cut in (len(data) // 4, len(data) // 2, len(data) - 3):
        try:
            decode_jpeg(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_arith_restart_marker_mismatch_raises():
    """A wrong RSTn ordinal inside a sequential arithmetic scan must be a
    ValueError (hostile stream), not a silent desync."""
    img = _rand_img(40, 32, 3, 5)
    data = bytearray(encode_jpeg_arith(img, quality=85, restart_interval=3))
    i = data.find(bytes([0xFF, 0xD0]))
    assert i > 0
    data[i + 1] = 0xD5  # expected RST0, present RST5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
