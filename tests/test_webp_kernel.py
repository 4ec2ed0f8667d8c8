"""VP8L (lossless WebP) decode lane.

SPEC DISCIPLINE (same rule as the JPEG/GIF lanes): the encoder here is
an INDEPENDENT transcription of RFC 9649 — its own LSB-first bit
packer, its own canonical-code builder and code-length-code writer, its
own color-cache simulation — sharing no code with kernels/webp.py.
Every stream it emits must decode bit-exactly; the hand-assembled
fixtures additionally pin LZ77 distance mapping, meta prefix-code
selection and the predictor transform at the single-bit level.  Change
both sides together or not at all.

PIL is absent in this sandbox (and PIL's WebP support itself rides a
native libwebp), so as with SOF3/SOF9 there is no cross-codec lane.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.webp import (
    _DIST_MAP,
    decode_webp,
    webp_meta,
)

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _W:
    """LSB-first bit packer (RFC 9649 §5.1)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Prefix codewords are written MSB of the codeword first."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _huff_lengths(freq: dict[int, int], limit: int = 15) -> dict[int, int]:
    """Length-limited COMPLETE prefix-code lengths via package-merge
    (deterministic tie-breaking).  The code-length code is stored in
    3-bit fields → its own lengths must fit 7; symbol codes fit 15."""
    if not freq:
        raise ValueError("no symbols")
    if len(freq) == 1:
        return {next(iter(freq)): 1}
    base = sorted((f, (s,)) for s, f in freq.items())
    merged = list(base)
    for _ in range(limit - 1):
        paired = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(base + paired)
    depth = {s: 0 for s in freq}
    for _, ms in merged[: 2 * len(freq) - 2]:
        for s in ms:
            depth[s] += 1
    assert max(depth.values()) <= limit
    assert sum(2 ** (limit - l) for l in depth.values()) == 1 << limit
    return depth


def _canon_codes(lengths: dict[int, int]) -> dict[int, int]:
    code = 0
    out: dict[int, int] = {}
    prev = None
    for l, s in sorted((l, s) for s, l in lengths.items() if l > 0):
        if prev is not None:
            code <<= l - prev
        prev = l
        out[s] = code
        code += 1
    return out


def _write_code(w: _W, lengths: dict[int, int], alphabet: int) -> None:
    """§5.2.2: simple form when possible, else the code-length code
    (lengths emitted one by one — repeats are optional and unused)."""
    syms = sorted(s for s, l in lengths.items() if l > 0)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.put(1, 1)  # simple
        w.put(len(syms) - 1, 1)
        if syms[0] <= 1:
            w.put(0, 1)  # first symbol in 1 bit
            w.put(syms[0], 1)
        else:
            w.put(1, 1)
            w.put(syms[0], 8)
        if len(syms) == 2:
            w.put(syms[1], 8)
        return
    w.put(0, 1)  # full form
    all_lengths = [lengths.get(s, 0) for s in range(alphabet)]
    clc_freq: dict[int, int] = {}
    for l in all_lengths:
        clc_freq[l] = clc_freq.get(l, 0) + 1
    clc_len = _huff_lengths(clc_freq, limit=7)
    clc_code = _canon_codes(clc_len)
    num_cl = max(
        i + 1 for i, s in enumerate(_CLC_ORDER) if clc_len.get(s, 0) > 0
    )
    num_cl = max(num_cl, 4)
    w.put(num_cl - 4, 4)
    for i in range(num_cl):
        w.put(clc_len.get(_CLC_ORDER[i], 0), 3)
    w.put(0, 1)  # no max_symbol trim
    single_clc = len([l for l in clc_len.values() if l > 0]) == 1
    for l in all_lengths:
        if not single_clc:
            w.put_code(clc_code[l], clc_len[l])


def _argb(rgba: np.ndarray) -> list[int]:
    h, wd, _ = rgba.shape
    out = []
    for y in range(h):
        for x in range(wd):
            r, g, b, a = (int(v) for v in rgba[y, x])
            out.append((a << 24) | (r << 16) | (g << 8) | b)
    return out


def _emit_entropy_coded(
    w: _W, pixels: list[int], cache_bits: int = 0, level0: bool = True
) -> None:
    """No-meta, literal/cache-only §5.2.3 image body (shared by the main
    image and hand-built transform sub-images).  Bit order per spec:
    cache info first, then (level 0 only) the meta-prefix-codes bit."""
    if cache_bits:
        w.put(1, 1)
        w.put(cache_bits, 4)
    else:
        w.put(0, 1)
    if level0:
        w.put(0, 1)  # no meta prefix codes
    shift = 32 - cache_bits if cache_bits else 0
    # pass 1: symbol streams under the greedy use-cache-when-hit policy
    cache: dict[int, int] = {}
    streams: dict[str, list[int]] = {"g": [], "r": [], "b": [], "a": []}
    for px in pixels:
        slot = (px * 0x1E35A7BD & 0xFFFFFFFF) >> shift if cache_bits else -1
        if cache_bits and cache.get(slot) == px:
            streams["g"].append(280 + slot)
            continue
        streams["g"].append((px >> 8) & 0xFF)
        streams["r"].append((px >> 16) & 0xFF)
        streams["b"].append(px & 0xFF)
        streams["a"].append((px >> 24) & 0xFF)
        if cache_bits:
            cache[slot] = px
    gal = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    codes = {}
    for key, alphabet in (("g", gal), ("r", 256), ("b", 256), ("a", 256)):
        freq: dict[int, int] = {}
        for s in streams[key]:
            freq[s] = freq.get(s, 0) + 1
        if not freq:
            freq = {0: 1}  # channel never coded: any 1-symbol code
        lengths = _huff_lengths(freq)
        _write_code(w, lengths, alphabet)
        codes[key] = (lengths, _canon_codes(lengths))
    _write_code(w, {1: 1}, 40)  # distance code: unused single symbol
    # pass 2: emit (same policy)
    cache.clear()
    for px in pixels:
        slot = (px * 0x1E35A7BD & 0xFFFFFFFF) >> shift if cache_bits else -1
        if cache_bits and cache.get(slot) == px:
            s = 280 + slot
            w.put_code(codes["g"][1][s], codes["g"][0][s])
            continue
        for key, s in (
            ("g", (px >> 8) & 0xFF),
            ("r", (px >> 16) & 0xFF),
            ("b", px & 0xFF),
            ("a", (px >> 24) & 0xFF),
        ):
            lengths, cmap = codes[key]
            if len([l for l in lengths.values() if l > 0]) > 1:
                w.put_code(cmap[s], lengths[s])
        if cache_bits:
            cache[slot] = px


def _container(body_bits: _W) -> bytes:
    payload = b"\x2f" + body_bits.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(w: _W, width: int, height: int, alpha: bool) -> None:
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(1 if alpha else 0, 1)
    w.put(0, 3)  # version


def ref_encode_vp8l(
    rgba: np.ndarray, cache_bits: int = 0, subtract_green: bool = False
) -> bytes:
    """Literal/cache VP8L encoder (no LZ77, no meta codes) with optional
    SUBTRACT_GREEN — the everyday-stream shape."""
    h, wd, _ = rgba.shape
    alpha = bool((rgba[:, :, 3] != 255).any())
    pixels = _argb(rgba)
    if subtract_green:
        out = []
        for px in pixels:
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            out.append((px & 0xFF00FF00) | (r << 16) | b)
        pixels = out
    w = _W()
    _header(w, wd, h, alpha)
    if subtract_green:
        w.put(1, 1)
        w.put(2, 2)  # transform type 2
    w.put(0, 1)  # end of transforms
    _emit_entropy_coded(w, pixels, cache_bits)
    return _container(w)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _rand_rgba(seed: int, h: int, wd: int, translucent: bool = True) -> np.ndarray:
    img = _rng(seed).integers(0, 256, (h, wd, 4), np.uint8)
    if not translucent:
        img[:, :, 3] = 255
    return img


# --- table sanity ------------------------------------------------------------


def test_distance_map_shape():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    # every offset points at an already-decoded raster position
    for dx, dy in _DIST_MAP:
        assert dy > 0 or (dy == 0 and dx > 0)


# --- round-trips against the independent encoder -----------------------------


def test_literal_roundtrip_rgba():
    img = _rand_rgba(1, 5, 7)
    w, h, ch, buf = decode_webp(ref_encode_vp8l(img))
    assert (w, h, ch) == (7, 5, 4)
    assert np.array_equal(
        np.frombuffer(buf, np.uint8).reshape(5, 7, 4), img
    )


def test_literal_roundtrip_opaque_drops_alpha():
    img = _rand_rgba(2, 4, 6, translucent=False)
    w, h, ch, buf = decode_webp(ref_encode_vp8l(img))
    assert (w, h, ch) == (6, 4, 3)
    assert np.array_equal(
        np.frombuffer(buf, np.uint8).reshape(4, 6, 3), img[:, :, :3]
    )


@pytest.mark.parametrize("cache_bits", [1, 4, 8])
def test_color_cache_roundtrip(cache_bits):
    rng = _rng(3)
    palette = rng.integers(0, 256, (6, 4), np.uint8)
    idx = rng.integers(0, 6, (9, 11))
    img = palette[idx]
    w, h, ch, buf = decode_webp(ref_encode_vp8l(img, cache_bits=cache_bits))
    got = np.frombuffer(buf, np.uint8).reshape(9, 11, ch)
    assert np.array_equal(got, img[:, :, :ch])


def test_subtract_green_roundtrip():
    img = _rand_rgba(4, 8, 3)
    w, h, ch, buf = decode_webp(ref_encode_vp8l(img, subtract_green=True))
    assert np.array_equal(
        np.frombuffer(buf, np.uint8).reshape(8, 3, 4), img
    )


def test_single_color_image_uses_simple_codes():
    img = np.zeros((3, 3, 4), np.uint8)
    img[:, :] = (10, 200, 30, 255)
    data = ref_encode_vp8l(img)
    w, h, ch, buf = decode_webp(data)
    assert (w, h, ch) == (3, 3, 3)
    assert np.frombuffer(buf, np.uint8).reshape(3, 3, 3).tolist() == (
        [[[10, 200, 30]] * 3] * 3
    )


def test_wide_image_roundtrip():
    img = _rand_rgba(5, 2, 300)
    w, h, ch, buf = decode_webp(ref_encode_vp8l(img))
    assert (w, h) == (300, 2)
    assert np.array_equal(np.frombuffer(buf, np.uint8).reshape(2, 300, 4), img)


# --- hand-built fixtures: LZ77, meta codes, transforms -----------------------


def _simple_code_bits(w: _W, syms: list[int]) -> None:
    _write_code(w, {s: 1 for s in syms}, 256)


def test_lz77_distance_one_copy():
    """literal + length-3/distance-1 copy → 4 identical pixels.  Green
    code {G=130, 258}, distance code single {1} (prefix value 2 →
    _DIST_MAP[1] = (1,0) → distance 1); length symbol 258 → prefix code
    2 → length 3, no extra bits."""
    w = _W()
    _header(w, 4, 1, alpha=False)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    _write_code(w, {130: 1, 258: 1}, 280)  # green
    _simple_code_bits(w, [20])  # red
    _simple_code_bits(w, [40])  # blue
    _simple_code_bits(w, [255])  # alpha
    _write_code(w, {1: 1}, 40)  # distance: single symbol 1
    glen = _huff_lengths({130: 1, 258: 1})
    gcode = _canon_codes(glen)
    w.put_code(gcode[130], glen[130])  # literal g=130 (r/b/a single: 0 bits)
    w.put_code(gcode[258], glen[258])  # copy: length prefix 2 → 3
    data = _container(w)
    got = decode_webp(data)
    assert got == (4, 1, 3, bytes([20, 130, 40] * 4))


def test_lz77_row_above_copy():
    """Second row copies the first via the 2-D map entry (0,1) →
    distance = width."""
    w = _W()
    _header(w, 3, 2, alpha=False)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    # greens 1,2,3 then copy len 3: green alphabet {1,2,3,258}
    glen = {1: 2, 2: 2, 3: 2, 258: 2}
    _write_code(w, glen, 280)
    _simple_code_bits(w, [9])
    _simple_code_bits(w, [7])
    _simple_code_bits(w, [255])
    _write_code(w, {0: 1}, 40)  # distance symbol 0 → value 1 → (0,1)
    gcode = _canon_codes(glen)
    for g in (1, 2, 3):
        w.put_code(gcode[g], glen[g])
    w.put_code(gcode[258], glen[258])  # length 3
    got = decode_webp(_container(w))
    expect = bytes([9, 1, 7, 9, 2, 7, 9, 3, 7] * 2)
    assert got == (3, 2, 3, expect)


def test_meta_prefix_code_selection():
    """Two 4-pixel meta blocks with different literal codes: the huffman
    image's (r<<8)|g pixels select per-block groups."""
    w = _W()
    _header(w, 8, 1, alpha=False)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(1, 1)  # meta prefix codes
    w.put(0, 3)  # hbits = 2 → blocks of 4 → huffman image 2x1
    # huffman image (level0=False): cache bit + 5 codes + 2 literals
    w.put(0, 1)  # no cache in sub-image
    _write_code(w, {0: 1, 1: 1}, 280)  # green = meta index
    _simple_code_bits(w, [0])  # red (high bits of meta index)
    _simple_code_bits(w, [0])
    _simple_code_bits(w, [255])
    _write_code(w, {1: 1}, 40)
    hl = _huff_lengths({0: 1, 1: 1})
    hc = _canon_codes(hl)
    w.put_code(hc[0], hl[0])
    w.put_code(hc[1], hl[1])
    # group 0: solid green=50, group 1: solid green=60 (single-symbol
    # codes read zero bits, so the groups differ only in their tables)
    for g in (50, 60):
        _simple_code_bits(w, [g])  # green (as 8-bit simple, <256)
        _simple_code_bits(w, [g + 1])  # red
        _simple_code_bits(w, [g + 2])  # blue
        _simple_code_bits(w, [255])  # alpha
        _write_code(w, {1: 1}, 40)
    got = decode_webp(_container(w))
    expect = bytes([51, 50, 52] * 4 + [61, 60, 62] * 4)
    assert got == (8, 1, 3, expect)


def test_predictor_transform_mode2_top():
    """4x2, predictor sub-image = single block mode 2 (T): second row
    residuals are zero, first row carries the values."""
    w = _W()
    _header(w, 4, 2, alpha=False)
    w.put(1, 1)  # transform present
    w.put(0, 2)  # type 0 = PREDICTOR
    w.put(2, 3)  # sbits = 4 → one 4x2 block → sub-image 1x1
    w.put(0, 1)  # sub-image: no cache
    _simple_code_bits(w, [2])  # green = predictor mode 2
    _simple_code_bits(w, [0])
    _simple_code_bits(w, [0])
    _simple_code_bits(w, [255])
    _write_code(w, {1: 1}, 40)
    w.put(0, 1)  # end of transforms
    # residual image: row0 = [A, d1, d2, d3] row1 = zeros
    # target row0 = [(10,20,30), (11,22,33), (9,18,27), (12,24,36)]
    # pred(0,0) = ff000000 → residual (10,20,30) alpha 0
    # row0 x>0 uses LEFT regardless of mode; row1 x=0 uses TOP; rest mode T
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    greens = [20, 2, 252, 6] + [0] * 4
    reds = [10, 1, 254, 3] + [0] * 4
    blues = [30, 3, 250, 9] + [0] * 4
    alphas = [0] + [0] * 7
    gl = _huff_lengths({s: greens.count(s) for s in set(greens)})
    rl = _huff_lengths({s: reds.count(s) for s in set(reds)})
    bl = _huff_lengths({s: blues.count(s) for s in set(blues)})
    _write_code(w, gl, 280)
    _write_code(w, rl, 256)
    _write_code(w, bl, 256)
    _simple_code_bits(w, [0])  # alpha: all residual 0
    _write_code(w, {1: 1}, 40)
    gc, rc, bc = _canon_codes(gl), _canon_codes(rl), _canon_codes(bl)
    for i in range(8):
        w.put_code(gc[greens[i]], gl[greens[i]])
        w.put_code(rc[reds[i]], rl[reds[i]])
        w.put_code(bc[blues[i]], bl[blues[i]])
    got_w, got_h, got_ch, buf = decode_webp(_container(w))
    assert (got_w, got_h) == (4, 2)
    px = np.frombuffer(buf, np.uint8).reshape(2, 4, got_ch)
    row0 = [[10, 20, 30], [11, 22, 33], [9, 18, 27], [12, 24, 36]]
    assert px[0, :, :3].tolist() == row0
    assert px[1, :, :3].tolist() == row0  # mode T copies the row above


def test_color_indexing_palette_bundling():
    """5-color palette (width_bits=1 → two 4-bit indices per pixel)."""
    w = _W()
    _header(w, 6, 2, alpha=False)
    w.put(1, 1)
    w.put(3, 2)  # type 3 = COLOR_INDEXING
    w.put(4, 8)  # palette size - 1 = 4
    # palette sub-image: 5 delta-coded ARGB pixels
    w.put(0, 1)  # no cache
    pal = [
        (255, 10, 20, 30), (255, 40, 50, 60), (255, 70, 80, 90),
        (255, 100, 110, 120), (255, 130, 140, 150),
    ]
    deltas = []
    prev = (0, 0, 0, 0)
    for p in pal:
        deltas.append(tuple((p[i] - prev[i]) & 0xFF for i in range(4)))
        prev = p
    dg = [d[2] for d in deltas]
    dr = [d[1] for d in deltas]
    db = [d[3] for d in deltas]
    da = [d[0] for d in deltas]
    gl = _huff_lengths({s: dg.count(s) for s in set(dg)})
    _write_code(w, gl, 280)
    rl = _huff_lengths({s: dr.count(s) for s in set(dr)})
    _write_code(w, rl, 256)
    bl = _huff_lengths({s: db.count(s) for s in set(db)})
    _write_code(w, bl, 256)
    al = _huff_lengths({s: da.count(s) for s in set(da)})
    _write_code(w, al, 256)
    _write_code(w, {1: 1}, 40)
    gc, rc, bc, ac = (
        _canon_codes(gl), _canon_codes(rl), _canon_codes(bl), _canon_codes(al)
    )
    multi = lambda lens: len([l for l in lens.values() if l > 0]) > 1
    for i in range(5):
        if multi(gl):
            w.put_code(gc[dg[i]], gl[dg[i]])
        if multi(rl):
            w.put_code(rc[dr[i]], rl[dr[i]])
        if multi(bl):
            w.put_code(bc[db[i]], bl[db[i]])
        if multi(al):
            w.put_code(ac[da[i]], al[da[i]])
    w.put(0, 1)  # end of transforms
    # packed image: width_bits=1 → packed width 3; indices per row:
    # row0 = 0,1,2,3,4,0  row1 = 4,3,2,1,0,4  green = lo | hi<<4
    idx_rows = [[0, 1, 2, 3, 4, 0], [4, 3, 2, 1, 0, 4]]
    packed = []
    for row in idx_rows:
        for i in range(0, 6, 2):
            packed.append(row[i] | (row[i + 1] << 4))
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    pl = _huff_lengths({s: packed.count(s) for s in set(packed)})
    _write_code(w, pl, 280)
    _simple_code_bits(w, [0])
    _simple_code_bits(w, [0])
    _simple_code_bits(w, [255])
    _write_code(w, {1: 1}, 40)
    pc = _canon_codes(pl)
    for s in packed:
        w.put_code(pc[s], pl[s])
    got_w, got_h, got_ch, buf = decode_webp(_container(w))
    assert (got_w, got_h, got_ch) == (6, 2, 3)
    px = np.frombuffer(buf, np.uint8).reshape(2, 6, 3)
    for y in range(2):
        for x in range(6):
            want = pal[idx_rows[y][x]]
            assert px[y, x].tolist() == [want[1], want[2], want[3]]


# --- container metadata ------------------------------------------------------


def test_webp_meta_variants():
    img = _rand_rgba(9, 3, 5)
    data = ref_encode_vp8l(img)
    assert webp_meta(data) == (5, 3, True)
    assert webp_meta(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert webp_meta(b"not a webp") is None
    # lossy VP8 frame header dims
    vp8 = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10)
        + bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    )
    assert webp_meta(vp8) == (320, 240, False)


def test_lossy_vp8_raises_not_implemented():
    vp8 = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10)
        + bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    )
    with pytest.raises(NotImplementedError, match="native codec"):
        decode_webp(vp8)


def test_operator_lane_integration():
    """multimodal._real_decode and sniff_image_meta route WebP natively
    (VP8L) and gate only lossy VP8."""
    from deepseek_ocr_spark.operators.multimodal import (
        _real_decode,
        sniff_image_meta,
    )

    img = _rand_rgba(20, 6, 9)
    data = ref_encode_vp8l(img)
    assert _real_decode(data) == (9, 6, 4)
    assert sniff_image_meta(data) == ("webp", 9, 6, 1)


# --- hostile-input contract --------------------------------------------------


def test_truncation_raises_value_error_only():
    data = ref_encode_vp8l(_rand_rgba(10, 4, 4))
    for cut in range(0, len(data)):
        try:
            decode_webp(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_mutation_fuzz_raises_value_error_only():
    data = bytearray(ref_encode_vp8l(_rand_rgba(11, 5, 5), cache_bits=3))
    rng = _rng(12)
    for _ in range(400):
        i = int(rng.integers(12, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_webp(bytes(data))
        except (ValueError, NotImplementedError):
            pass
        data[i] = old


def test_dims_sanity_bound():
    w = _W()
    _header(w, 16384, 16384, alpha=False)  # 2^28 exactly is allowed...
    w2 = _W()
    _header(w2, 16384, 16383, alpha=False)
    # 16384*16384 = 2^28 — at the bound, decode proceeds (then fails on
    # truncation); we only pin that the guard raises cleanly, not where
    try:
        decode_webp(_container(w))
    except ValueError:
        pass
