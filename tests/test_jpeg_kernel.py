"""Stdlib baseline-JPEG kernel: decode parity against INDEPENDENT scalar
transcriptions (never the module itself) on hand-built JPEG streams, plus
encoder round-trips and the PIL-gated cross-checks (codec-present lane).

The in-test references transcribe the same public libjpeg algorithms the
module does (jidctint.c islow, jdsample.c fancy upsample, jdcolor.c YCbCr)
— two independent transcriptions cross-check each other, the pattern of
tests/test_pixels.ref_resize_bicubic."""

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels import jpeg, pixels
from deepseek_ocr_spark.kernels.jpeg import ZIGZAG, decode_jpeg, encode_jpeg_baseline

# --- independent scalar references -------------------------------------------

_CB, _P1 = 13, 2


def _f(x):
    return int(round(x * (1 << _CB)))


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _ref_idct_1d(c, descale):
    z2, z3 = c[2], c[6]
    z1 = (z2 + z3) * _f(0.541196100)
    t2 = z1 - z3 * _f(1.847759065)
    t3 = z1 + z2 * _f(0.765366865)
    tmp0 = (c[0] + c[4]) << _CB
    tmp1 = (c[0] - c[4]) << _CB
    t10, t13 = tmp0 + t3, tmp0 - t3
    t11, t12 = tmp1 + t2, tmp1 - t2
    a0, a1, a2, a3 = c[7], c[5], c[3], c[1]
    z1, z2 = a0 + a3, a1 + a2
    z3, z4 = a0 + a2, a1 + a3
    z5 = (z3 + z4) * _f(1.175875602)
    a0 *= _f(0.298631336)
    a1 *= _f(2.053119869)
    a2 *= _f(3.072711026)
    a3 *= _f(1.501321110)
    z1 *= -_f(0.899976223)
    z2 *= -_f(2.562915447)
    z3 = z3 * -_f(1.961570560) + z5
    z4 = z4 * -_f(0.390180644) + z5
    a0 += z1 + z3
    a1 += z2 + z4
    a2 += z2 + z3
    a3 += z1 + z4
    return [
        _descale(t10 + a3, descale), _descale(t11 + a2, descale),
        _descale(t12 + a1, descale), _descale(t13 + a0, descale),
        _descale(t13 - a0, descale), _descale(t12 - a1, descale),
        _descale(t11 - a2, descale), _descale(t10 - a3, descale),
    ]


def ref_idct_islow(block64, quant64):
    """Scalar jpeg_idct_islow: natural-order coeffs+quant → 8x8 samples."""
    d = [block64[i] * quant64[i] for i in range(64)]
    cols = [
        _ref_idct_1d([d[r * 8 + c] for r in range(8)], _CB - _P1)
        for c in range(8)
    ]
    ws = [[cols[c][r] for c in range(8)] for r in range(8)]
    rows = [_ref_idct_1d(ws[r], _CB + _P1 + 3) for r in range(8)]
    return [[max(0, min(255, v + 128)) for v in row] for row in rows]


def _f16(x):
    return int(round(x * 65536))


def ref_ycc_to_rgb(y, cb, cr):
    r = y + ((_f16(1.40200) * (cr - 128) + 32768) >> 16)
    b = y + ((_f16(1.77200) * (cb - 128) + 32768) >> 16)
    g = y + (
        (-_f16(0.34414) * (cb - 128) + 32768 + -_f16(0.71414) * (cr - 128)) >> 16
    )
    clamp = lambda v: max(0, min(255, v))
    return clamp(r), clamp(g), clamp(b)


def ref_h2v2_fancy(plane):
    """Scalar jdsample.c h2v2_fancy_upsample (context rows duplicate edges)."""
    h, w = len(plane), len(plane[0])
    out = [[0] * (w * 2) for _ in range(h * 2)]
    for r in range(h):
        for v in range(2):
            far = plane[max(r - 1, 0)] if v == 0 else plane[min(r + 1, h - 1)]
            cs = [plane[r][c] * 3 + far[c] for c in range(w)]
            orow = out[2 * r + v]
            for c in range(w):
                left = cs[c - 1] if c > 0 else None
                right = cs[c + 1] if c + 1 < w else None
                orow[2 * c] = (
                    (cs[c] * 4 + 8) >> 4 if left is None
                    else (cs[c] * 3 + left + 8) >> 4
                )
                orow[2 * c + 1] = (
                    (cs[c] * 4 + 7) >> 4 if right is None
                    else (cs[c] * 3 + right + 7) >> 4
                )
    return out


# --- hand-built baseline JPEG streams ----------------------------------------

# DC table: 12 symbols (sizes 0-11) all at code length 4; AC table: 255
# symbols at code length 9 plus one at 10 (a DHT count is a single byte,
# so 256-at-one-length is unencodable) — canonical, no all-ones code
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_AC_VALS = list(range(256))


def _codes(bits, vals):
    out, code, k = {}, 0, 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            out[vals[k]] = (code, l)
            k += 1
            code += 1
        code <<= 1
    return out


_DC_CODES = _codes(_DC_BITS, _DC_VALS)
_AC_CODES = _codes(_AC_BITS, _AC_VALS)


class _W:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, code, n):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _emit_block(w, zz, pred):
    """Entropy-encode one block given zigzag-order coefficients."""
    diff = zz[0] - pred
    size = abs(diff).bit_length()
    c, l = _DC_CODES[size]
    w.put(c, l)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, l = _AC_CODES[0xF0]
            w.put(c, l)
            run -= 16
        s = abs(zz[k]).bit_length()
        c, l = _AC_CODES[(run << 4) | s]
        w.put(c, l)
        w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, l = _AC_CODES[0]
        w.put(c, l)
    return zz[0]


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def build_jpeg(w, h, comps, quants, mcu_blocks, dri=0):
    """Hand-assemble a baseline JPEG. comps: [(h, v, tq)]; quants: {tq:
    [64] natural}; mcu_blocks: list of MCUs, each a list of zigzag-order
    64-coeff blocks in interleave order (or raster blocks when 1 comp)."""
    out = bytearray(b"\xff\xd8")
    for tq, q in quants.items():
        zz = bytes(q[ZIGZAG[k]] for k in range(64))
        out += _seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (ch_, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch_ << 4) | cv, tq])
    out += bytearray(_seg(0xC0, sof))
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
        if dri and m and m % dri == 0:
            wtr.flush()
            out += wtr.out
            wtr = _W()
            out += bytes([0xFF, 0xD0 + ((m // dri - 1) & 7)])
            preds = {}
        for ci, zz in mcu:
            preds[ci] = _emit_block(wtr, zz, preds.get(ci, 0))
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _zz_from_natural(nat):
    return [nat[ZIGZAG[k]] for k in range(64)]


# --- decoder tests -----------------------------------------------------------


def test_dc_only_gray_flat():
    """DC-only block: every sample = clamp(128 + round(DC*q/8)) — closed
    form of the islow path, hand-computable."""
    q = [16] * 64
    for dc, expect in [(5, 128 + 10), (-6, 128 - 12), (0, 128), (100, 255)]:
        blk = [0] * 64
        blk[0] = dc
        data = build_jpeg(8, 8, [(1, 1, 0)], {0: q}, [[(0, _zz_from_natural(blk))]])
        w, h, ch, buf = decode_jpeg(data)
        assert (w, h, ch) == (8, 8, 1)
        assert set(buf) == {expect}, (dc, set(buf))


def test_gray_ac_blocks_match_scalar_reference():
    """Two 8x8 blocks with AC structure — module vs the independent scalar
    islow transcription."""
    rng = np.random.RandomState(7)
    q = list(rng.randint(1, 40, 64))
    b1, b2 = [0] * 64, [0] * 64
    b1[0], b1[1], b1[8], b1[27] = 12, -3, 7, 2
    b2[0], b2[9], b2[63] = -20, 5, 1
    data = build_jpeg(
        16, 8, [(1, 1, 0)], {0: q},
        [[(0, _zz_from_natural(b1))], [(0, _zz_from_natural(b2))]],
    )
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (16, 8, 1)
    got = np.frombuffer(buf, np.uint8).reshape(8, 16)
    # note: DC of block 2 is DIFFERENTIAL in the stream builder's preds —
    # _emit_block encodes diff, so the decoded DC is absolute b2[0]
    for bx, blk in ((0, b1), (1, b2)):
        ref = ref_idct_islow(blk, q)
        assert got[:, bx * 8 : bx * 8 + 8].tolist() == ref


def test_gray_fuzz_matches_scalar_reference():
    rng = np.random.RandomState(42)
    for trial in range(8):
        q = list(rng.randint(1, 64, 64))
        blk = [0] * 64
        for _ in range(rng.randint(1, 20)):
            blk[rng.randint(0, 64)] = int(rng.randint(-200, 200))
        data = build_jpeg(8, 8, [(1, 1, 0)], {0: q}, [[(0, _zz_from_natural(blk))]])
        _, _, _, buf = decode_jpeg(data)
        ref = ref_idct_islow(blk, q)
        assert list(buf) == [v for row in ref for v in row], trial


def test_color_444_matches_scalar_pipeline():
    """8x8 4:4:4: three DC-only planes → flat YCbCr → reference color
    convert."""
    q = [16] * 64
    vals = {"y": 4, "cb": -8, "cr": 6}
    mk = lambda dc: (lambda b: b)([dc] + [0] * 63)
    mcu = [(0, mk(vals["y"])), (1, mk(vals["cb"])), (2, mk(vals["cr"]))]
    data = build_jpeg(
        8, 8, [(1, 1, 0), (1, 1, 0), (1, 1, 0)], {0: q}, [mcu]
    )
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 3)
    y = 128 + ((vals["y"] * 16 + 4) >> 3)
    cb = 128 + ((vals["cb"] * 16 + (4 if vals["cb"] > 0 else 3)) >> 3)
    cb = 128 + (vals["cb"] * 2)  # -8*16/8 = -16 exactly
    cr = 128 + (vals["cr"] * 2)  # 6*16/8 = 12 exactly
    expect = ref_ycc_to_rgb(y, cb, cr)
    assert set(zip(buf[0::3], buf[1::3], buf[2::3])) == {expect}


def test_color_420_fancy_upsample_matches_scalar_pipeline():
    """16x16 4:2:0: structured Y blocks + AC-bearing chroma — the full
    module path vs the scalar reference pipeline (ref IDCT → ref fancy
    upsample → ref color convert)."""
    rng = np.random.RandomState(3)
    ql = list(rng.randint(1, 24, 64))
    qc = list(rng.randint(1, 24, 64))
    yb = []
    for i in range(4):
        b = [0] * 64
        b[0], b[1 + i], b[8] = 10 + i, 3, -2
        yb.append(b)
    cb = [0] * 64
    cb[0], cb[2], cb[17] = -5, 4, -3
    cr = [0] * 64
    cr[0], cr[1], cr[10] = 7, -2, 5
    mcu = [(0, _zz_from_natural(b)) for b in yb]
    mcu += [(1, _zz_from_natural(cb)), (2, _zz_from_natural(cr))]
    # NOTE: Y DC values are differential per component across blocks —
    # build_jpeg handles preds per component index
    data = build_jpeg(
        16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], {0: ql, 1: qc}, [mcu]
    )
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (16, 16, 3)
    got = np.frombuffer(buf, np.uint8).reshape(16, 16, 3)

    ys = [ref_idct_islow(b, ql) for b in yb]
    yplane = [
        ys[0][r] + ys[1][r] for r in range(8)
    ] + [ys[2][r] + ys[3][r] for r in range(8)]
    cbp = ref_h2v2_fancy(ref_idct_islow(cb, qc))
    crp = ref_h2v2_fancy(ref_idct_islow(cr, qc))
    for r in range(16):
        for c in range(16):
            exp = ref_ycc_to_rgb(yplane[r][c], cbp[r][c], crp[r][c])
            assert tuple(got[r, c]) == exp, (r, c)


def test_restart_markers():
    """DRI=1: an RSTn between every MCU, DC predictors reset — decoded
    output equals the no-restart stream's."""
    q = [16] * 64
    blocks = []
    for dc in (5, 9, -3, 20):
        b = [0] * 64
        b[0] = dc
        blocks.append([(0, _zz_from_natural(b))])
    plain = decode_jpeg(build_jpeg(32, 8, [(1, 1, 0)], {0: q}, blocks))
    rst = decode_jpeg(build_jpeg(32, 8, [(1, 1, 0)], {0: q}, blocks, dri=1))
    assert plain == rst
    expect = [128 + ((dc * 16 + 4) >> 3) if dc >= 0 else
              128 + ((dc * 16 + 4) >> 3) for dc in (5, 9, -3, 20)]
    got = np.frombuffer(rst[3], np.uint8).reshape(8, 32)
    for i, e in enumerate(expect):
        assert set(got[:, i * 8 : i * 8 + 8].flatten()) == {e}


def test_partial_mcu_crop():
    """Dimensions not divisible by the MCU: padded blocks decode, output
    crops to the declared WxH."""
    q = [16] * 64
    b = [0] * 64
    b[0] = 5
    data = build_jpeg(5, 3, [(1, 1, 0)], {0: q}, [[(0, _zz_from_natural(b))]])
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch, len(buf)) == (5, 3, 1, 15)
    assert set(buf) == {138}


def test_hierarchical_coded_raises_not_implemented():
    """SOF5 (hierarchical) stays behind the codec gate; arithmetic
    SOF9/SOF10 are handled natively since r7 (tests/test_jparith.py),
    lossless SOF3 since r7 too (tests/test_jpeg_lossless.py),
    progressive SOF2 since r5 (tests/test_jpeg_progressive.py)."""
    q = [16] * 64
    base = bytearray(b"\xff\xd8")
    zz = bytes(q[ZIGZAG[k]] for k in range(64))
    base += _seg(0xDB, bytes([0]) + zz)
    base += _seg(0xC5, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(base))


def test_corrupt_raises_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_huge_sof_dims_raise_value_error_before_allocating():
    """A ~100-byte SOF declaring 65500x65500 must hit the 1<<28-pixel
    sanity bound (ValueError) before any coefficient storage or MCU loop
    is sized from it."""
    q = [16] * 64
    base = bytearray(b"\xff\xd8")
    zz = bytes(q[ZIGZAG[k]] for k in range(64))
    base += _seg(0xDB, bytes([0]) + zz)
    base += _seg(0xC0, struct.pack(">BHHB", 8, 65500, 65500, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="sanity"):
        decode_jpeg(bytes(base))


# --- encoder tests -----------------------------------------------------------


def test_encoder_roundtrip_gray():
    from tests.test_pixels import gradient

    img = gradient(40, 24, 1)
    data = encode_jpeg_baseline(img, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (40, 24, 1)
    diff = np.abs(
        np.frombuffer(buf, np.uint8).astype(int)
        - np.frombuffer(img[3], np.uint8).astype(int)
    )
    assert diff.max() <= 16 and diff.mean() <= 4.0


def test_encoder_roundtrip_rgb():
    from tests.test_pixels import gradient

    img = gradient(33, 17, 3)
    data = encode_jpeg_baseline(img, quality=95)
    w, h, ch, buf = decode_jpeg(data)
    assert (w, h, ch) == (33, 17, 3)
    diff = np.abs(
        np.frombuffer(buf, np.uint8).astype(int)
        - np.frombuffer(img[3], np.uint8).astype(int)
    )
    assert diff.max() <= 32 and diff.mean() <= 6.0  # chroma rotation is lossy


def test_encoder_quality_monotone_size():
    from tests.test_pixels import gradient

    img = gradient(64, 64, 3)
    sizes = [len(encode_jpeg_baseline(img, quality=qq)) for qq in (30, 60, 95)]
    assert sizes[0] < sizes[2]


def test_encoder_meta_sniffs():
    """Our output is a well-formed JFIF: the header sniffer reads it."""
    from deepseek_ocr_spark.operators.multimodal import sniff_image_meta
    from tests.test_pixels import gradient

    data = encode_jpeg_baseline(gradient(31, 22, 3), quality=80)
    assert sniff_image_meta(data) == ("jpeg", 31, 22, 1)


# --- codec-present lane (PIL cross-checks; self-skip in this sandbox) --------


def test_decode_matches_pil_bytes():
    """Byte parity with libjpeg on a PIL-encoded baseline file — the
    ground truth the transcriptions target."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from tests.test_pixels import gradient

    for subsampling in (0, 1, 2):  # 4:4:4, 4:2:2, 4:2:0
        img = gradient(37, 23, 3)
        pim = PIL_Image.frombytes("RGB", (37, 23), img[3])
        out = io.BytesIO()
        pim.save(out, "JPEG", quality=90, subsampling=subsampling)
        data = out.getvalue()
        with PIL_Image.open(io.BytesIO(data)) as im:
            expected = im.convert("RGB").tobytes()
        w, h, ch, buf = decode_jpeg(data)
        assert (w, h, ch) == (37, 23, 3)
        assert buf == expected, f"subsampling={subsampling}"


def test_pil_opens_our_encode():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from tests.test_pixels import gradient

    data = encode_jpeg_baseline(gradient(29, 18, 3), quality=92)
    with PIL_Image.open(io.BytesIO(data)) as im:
        assert (im.width, im.height) == (29, 18)
        pil_pixels = im.convert("RGB").tobytes()
    assert decode_jpeg(data)[3] == pil_pixels  # same decoder arithmetic


def test_mutation_fuzz_raises_only_value_error():
    """Hostile-input contract (the vision stages' drop rule catches
    ValueError ONLY): byte-flipped / truncated / spliced variants of a
    valid stream must never escape with struct.error, KeyError,
    IndexError or OverflowError and kill a task."""
    from tests.test_pixels import gradient

    rng = np.random.RandomState(1)
    base = encode_jpeg_baseline(gradient(24, 16, 3), quality=80)
    for trial in range(600):
        data = bytearray(base)
        mode = trial % 4
        if mode < 2:
            for _ in range(rng.randint(1, 6)):
                data[rng.randint(0, len(data))] = rng.randint(0, 256)
        elif mode == 2:
            data = data[: rng.randint(4, len(data))]
        else:
            at = rng.randint(0, len(data))
            data = (data[:at]
                    + bytes(rng.randint(0, 256, rng.randint(1, 40),
                                        dtype=np.uint8).tolist())
                    + data[at:])
        try:
            decode_jpeg(bytes(data))
        except (ValueError, NotImplementedError):
            pass  # the only allowed failure modes
