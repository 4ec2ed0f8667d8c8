"""TIFF kernel: decoder pinned against hand-built files written by an
INDEPENDENT writer in this module (IFDs assembled tag-by-tag, PackBits /
LZW encoders transcribed from TIFF 6.0 §9/§13 — the same
change-both-together spec discipline as ref_resize_bicubic), plus
mutation fuzz and the hostile-input ValueError-only contract."""

import struct
import zlib

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.tiff import decode_tiff


def _entry(bo, tag, typ, values):
    """One 12-byte IFD entry + (payload bytes or None if inline)."""
    size = {1: 1, 3: 2, 4: 4}[typ]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    raw = struct.pack(bo + fmt * len(values), *values)
    total = size * len(values)
    if total <= 4:
        return struct.pack(bo + "HHI", tag, typ, len(values)) + raw.ljust(4, b"\0"), None
    return struct.pack(bo + "HHI", tag, typ, len(values)), raw


def build_tiff(tags, chunks, bo="<"):
    """tags: list of (tag, type, [values]) with 273/279 (or 324/325)
    omitted — they are derived from chunks and appended; chunks: list of
    compressed strip/tile payloads. Writes header | chunks | IFD |
    out-of-line values."""
    header = struct.pack(bo + "2sH", b"II" if bo == "<" else b"MM", 42)
    body = b"".join(chunks)
    offs = []
    pos = 8
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    tiled = any(t[0] in (322, 323) for t in tags)
    all_tags = sorted(
        tags
        + [(324 if tiled else 273, 4, offs), (325 if tiled else 279, 4, [len(c) for c in chunks])]
    )
    ifd_off = pos
    n = len(all_tags)
    out_pos = ifd_off + 2 + 12 * n + 4
    entries = b""
    payloads = b""
    for tag, typ, values in all_tags:
        ent, raw = _entry(bo, tag, typ, values)
        if raw is None:
            entries += ent + b""
        else:
            entries += ent + struct.pack(bo + "I", out_pos)
            payloads += raw
            out_pos += len(raw)
    ifd = struct.pack(bo + "H", n) + entries + struct.pack(bo + "I", 0)
    return header + struct.pack(bo + "I", ifd_off) + body + ifd + payloads


def packbits_encode(row: bytes) -> bytes:
    """Independent PackBits writer: literal-only encoding (always legal)."""
    out = bytearray()
    for i in range(0, len(row), 128):
        part = row[i : i + 128]
        out += bytes([len(part) - 1]) + part
    return bytes(out)


class LzwEncoder:
    """Independent literal-only LZW writer (TIFF 6.0 §13): ClearCode,
    then every byte as its own 8-bit-literal code. A compliant decoder
    grows its table one entry per code after the first, so width bumps
    at table length 511/1023/2047 are exercised without string codes."""

    def __init__(self):
        self.acc = 0
        self.bits = 0
        self.out = bytearray()
        self.width = 9
        self.table_len = 258

    def emit(self, code):
        self.acc = (self.acc << self.width) | code
        self.bits += self.width
        while self.bits >= 8:
            self.out.append((self.acc >> (self.bits - 8)) & 0xFF)
            self.bits -= 8

    def encode(self, data: bytes) -> bytes:
        self.emit(256)
        for i, b in enumerate(data):
            self.emit(b)
            if i > 0:  # decoder adds an entry per code after the first
                self.table_len += 1
                if self.table_len in (511, 1023, 2047):
                    self.width += 1
                elif self.table_len == 4094:
                    self.emit(256)
                    self.table_len = 258
                    self.width = 9
        self.emit(257)
        if self.bits:
            self.out.append((self.acc << (8 - self.bits)) & 0xFF)
        return bytes(self.out)


def gray_gradient(w, h):
    return bytes((7 * x + 13 * y) % 256 for y in range(h) for x in range(w))


BASE_GRAY = [(256, 3, [0]), (257, 3, [0]), (258, 3, [8]), (259, 3, [1]),
             (262, 3, [1]), (277, 3, [1]), (278, 3, [0])]


def _tags(base, over):
    d = {t: (t, typ, v) for t, typ, v in base}
    for tag, (typ, v) in over.items():
        d[tag] = (tag, typ, v)
    return list(d.values())


def gray_tags(w, h, rps, over=None):
    return _tags(BASE_GRAY, {256: (3, [w]), 257: (3, [h]), 278: (3, [rps]), **(over or {})})


def test_gray8_uncompressed_two_strips_both_byte_orders():
    w, h = 5, 4
    pix = gray_gradient(w, h)
    chunks = [pix[: 2 * w], pix[2 * w :]]
    for bo in ("<", ">"):
        got = decode_tiff(build_tiff(gray_tags(w, h, 2), chunks, bo=bo))
        assert got == (w, h, 1, pix)


def test_white_is_zero_inverts():
    w, h = 3, 2
    pix = gray_gradient(w, h)
    data = build_tiff(gray_tags(w, h, h, over={262: (3, [0])}), [pix])
    assert decode_tiff(data)[3] == bytes(255 - b for b in pix)


def test_bilevel_1bit_row_padding():
    # 10 wide: rows pack to 2 bytes; formula bit = (x ^ y) & 1
    w, h = 10, 3
    rows = []
    for y in range(h):
        bits = [(x ^ y) & 1 for x in range(w)]
        packed = bytearray(2)
        for x, b in enumerate(bits):
            packed[x // 8] |= b << (7 - x % 8)
        rows.append(bytes(packed))
    data = build_tiff(gray_tags(w, h, h, over={258: (3, [1])}), [b"".join(rows)])
    got = decode_tiff(data)
    assert got[:3] == (w, h, 1)
    expect = bytes(255 * ((x ^ y) & 1) for y in range(h) for x in range(w))
    assert got[3] == expect


def test_gray4_nibble_expansion():
    w, h = 3, 2  # odd width: rows pack to 2 bytes, low nibble of last byte pad
    vals = [[1, 15, 7], [0, 9, 2]]
    raw = bytes([0x1F, 0x70, 0x09, 0x20])
    data = build_tiff(gray_tags(w, h, h, over={258: (3, [4])}), [raw])
    got = decode_tiff(data)
    assert got[3] == bytes(v * 17 for row in vals for v in row)


def test_palette_colormap_scaling():
    w, h = 4, 1
    idx = bytes([0, 3, 1, 2])
    n = 256
    cmap = [0] * (3 * n)
    colors = [(250, 10, 20), (0, 128, 255), (7, 7, 7), (200, 200, 0)]
    for i, (r, g, b) in enumerate(colors):
        cmap[i], cmap[n + i], cmap[2 * n + i] = r * 257, g * 257, b * 257
    data = build_tiff(
        gray_tags(w, h, h, over={262: (3, [3]), 320: (3, cmap)}), [idx]
    )
    got = decode_tiff(data)
    assert got[:3] == (w, h, 3)
    expect = b"".join(bytes(colors[i]) for i in idx)
    assert got[3] == expect


def rgb_gradient(w, h, spp=3):
    return bytes(
        (11 * x + 5 * y + 29 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(spp)
    )


def test_rgb24_and_rgba():
    w, h = 4, 3
    for spp in (3, 4):
        pix = rgb_gradient(w, h, spp)
        tags = gray_tags(w, h, h, over={258: (3, [8] * spp), 262: (3, [2]), 277: (3, [spp])})
        got = decode_tiff(build_tiff(tags, [pix]))
        assert got == (w, h, spp, pix)


def test_packbits_strips():
    w, h = 6, 4
    pix = gray_gradient(w, h)
    chunks = [packbits_encode(pix[: 2 * w]), packbits_encode(pix[2 * w :])]
    data = build_tiff(gray_tags(w, h, 2, over={259: (3, [32773])}), chunks)
    assert decode_tiff(data) == (w, h, 1, pix)


def test_packbits_repeat_runs_hand_built():
    # hand-assembled stream: repeat 0xAB x4 (-3 = 0xFD), literal [1,2] (0x01),
    # no-op (0x80), repeat 0x00 x2 (0xFF)
    stream = bytes([0xFD, 0xAB, 0x01, 1, 2, 0x80, 0xFF, 0x00])
    pix = bytes([0xAB] * 4 + [1, 2] + [0, 0])
    data = build_tiff(gray_tags(8, 1, 1, over={259: (3, [32773])}), [stream])
    assert decode_tiff(data)[3] == pix


def test_lzw_literal_stream_with_width_bumps():
    # 40x20 = 800 samples: decoder table passes 511 → the 10-bit bump fires
    w, h = 40, 20
    pix = gray_gradient(w, h)
    data = build_tiff(
        gray_tags(w, h, h, over={259: (3, [5])}), [LzwEncoder().encode(pix)]
    )
    assert decode_tiff(data) == (w, h, 1, pix)


def test_lzw_string_codes_hand_computed():
    # TIFF 6.0 §13 worked shape: input 7 7 7 8 8 7 7 6 6.
    # Encoder emits: Clear(256), 7, 258(=77), 8, 8, 258(=77), 6, 6, EOI.
    # Hand-packed at 9 bits each.
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        bits += 9
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    pix = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    data = build_tiff(gray_tags(9, 1, 1, over={259: (3, [5])}), [bytes(out)])
    assert decode_tiff(data)[3] == pix


def test_deflate_with_predictor2_rgb():
    w, h = 5, 3
    pix = rgb_gradient(w, h)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w, 3).astype(np.int16)
    diff = arr.copy()
    diff[:, 1:] = (arr[:, 1:] - arr[:, :-1]) % 256
    raw = diff.astype(np.uint8).tobytes()
    tags = gray_tags(
        w, h, h,
        over={258: (3, [8, 8, 8]), 262: (3, [2]), 277: (3, [3]),
              259: (3, [8]), 317: (3, [2])},
    )
    data = build_tiff(tags, [zlib.compress(raw)])
    assert decode_tiff(data) == (w, h, 3, pix)


def test_lzw_with_predictor2_gray():
    w, h = 7, 4
    pix = gray_gradient(w, h)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w).astype(np.int16)
    diff = arr.copy()
    diff[:, 1:] = (arr[:, 1:] - arr[:, :-1]) % 256
    raw = diff.astype(np.uint8).tobytes()
    data = build_tiff(
        gray_tags(w, h, h, over={259: (3, [5]), 317: (3, [2])}),
        [LzwEncoder().encode(raw)],
    )
    assert decode_tiff(data) == (w, h, 1, pix)


def test_tiled_layout_with_edge_crop():
    # 5x5 image, 4x4 tiles → 2x2 grid with cropped right/bottom edges
    w = h = 5
    tw = th = 4
    pix = np.frombuffer(gray_gradient(w, h), np.uint8).reshape(h, w)
    chunks = []
    for ty in range(2):
        for tx in range(2):
            tile = np.zeros((th, tw), np.uint8)
            ys, xs = ty * th, tx * tw
            hh, ww = min(th, h - ys), min(tw, w - xs)
            tile[:hh, :ww] = pix[ys : ys + hh, xs : xs + ww]
            chunks.append(tile.tobytes())
    tags = _tags(
        BASE_GRAY,
        {256: (3, [w]), 257: (3, [h]), 322: (3, [tw]), 323: (3, [th])},
    )
    tags = [t for t in tags if t[0] != 278]
    got = decode_tiff(build_tiff(tags, chunks))
    assert got == (w, h, 1, pix.tobytes())


def _rgb_jpeg_bytes(w, h, value):
    from deepseek_ocr_spark.kernels.jpeg import encode_jpeg_baseline

    flat = bytes([value]) * (w * h * 3)
    return encode_jpeg_baseline((w, h, 3, flat), quality=95)


def test_jpeg_in_tiff_full_streams():
    w, h, rps = 16, 16, 8
    strips = [_rgb_jpeg_bytes(w, rps, 100), _rgb_jpeg_bytes(w, rps, 200)]
    tags = gray_tags(w, h, rps, over={259: (3, [7]), 262: (3, [6]), 277: (3, [3]),
                                   258: (3, [8, 8, 8])})
    gw, gh, gc, buf = decode_tiff(build_tiff(tags, strips))
    assert (gw, gh, gc) == (w, h, 3)
    arr = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
    # flat-color JPEG round-trips within quantization error
    assert abs(int(arr[:rps].mean()) - 100) <= 3
    assert abs(int(arr[rps:].mean()) - 200) <= 3


def test_jpeg_in_tiff_abbreviated_with_jpegtables():
    w, h = 16, 8
    full = _rgb_jpeg_bytes(w, h, 150)
    # split the full stream into a tables stream (DQT+DHT) and an
    # abbreviated image stream (everything else) by walking segments
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    i = 2
    while i < len(full):
        assert full[i] == 0xFF
        marker = full[i + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:
            image += full[i:-2] + b""
            image += b"\xff\xd9"
            break
        seg_len = int.from_bytes(full[i + 2 : i + 4], "big")
        seg = full[i : i + 2 + seg_len]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            image += seg
        i += 2 + seg_len
    tables += b"\xff\xd9"
    tags = gray_tags(w, h, h, over={259: (3, [7]), 262: (3, [6]), 277: (3, [3]),
                                 258: (3, [8, 8, 8]),
                                 347: (1, list(bytes(tables)))})
    gw, gh, gc, buf = decode_tiff(build_tiff(tags, [bytes(image)]))
    assert (gw, gh, gc) == (w, h, 3)
    arr = np.frombuffer(buf, np.uint8)
    assert abs(int(arr.mean()) - 150) <= 3


def test_gray16_both_byte_orders_top8_display():
    w, h = 4, 3
    vals = [(1000 * i + 37) % 65536 for i in range(w * h)]
    for bo in ("<", ">"):
        raw = struct.pack(bo + "H" * len(vals), *vals)
        tags = gray_tags(w, h, h, over={258: (3, [16])})
        got = decode_tiff(build_tiff(tags, [raw], bo=bo))
        assert got == (w, h, 1, bytes(v >> 8 for v in vals))


def test_gray16_white_is_zero_inverts_in_16bit():
    w, h = 3, 2
    vals = [0, 255, 256, 65535, 32768, 500]
    raw = struct.pack("<" + "H" * 6, *vals)
    tags = gray_tags(w, h, h, over={258: (3, [16]), 262: (3, [0])})
    got = decode_tiff(build_tiff(tags, [raw]))
    # invert at 16 bit then take top 8: (65535-v) >> 8
    assert got == (w, h, 1, bytes((65535 - v) >> 8 for v in vals))


def test_rgb48_with_predictor2():
    w, h = 5, 2
    vals = [(517 * i + 11) % 65536 for i in range(w * h * 3)]
    arr = np.array(vals, np.uint16).reshape(h, w, 3)
    diff = arr.astype(np.int32).copy()
    diff[:, 1:] = (arr[:, 1:].astype(np.int32) - arr[:, :-1]) % 65536
    raw = diff.astype("<u2").tobytes()
    tags = gray_tags(
        w, h, h,
        over={258: (3, [16, 16, 16]), 262: (3, [2]), 277: (3, [3]),
              317: (3, [2])},
    )
    got = decode_tiff(build_tiff(tags, [raw]))
    assert got == (w, h, 3, (arr >> 8).astype(np.uint8).tobytes())


def test_planar_rgb_strip_sets():
    """PlanarConfiguration 2: all R strips, then G, then B — recombined
    chunky; two strips per plane exercise the per-plane indexing."""
    w, h = 4, 4
    pix = rgb_gradient(w, h)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w, 3)
    chunks = []
    for p in range(3):
        chunks.append(arr[:2, :, p].tobytes())
        chunks.append(arr[2:, :, p].tobytes())
    tags = gray_tags(
        w, h, 2,
        over={258: (3, [8, 8, 8]), 262: (3, [2]), 277: (3, [3]),
              284: (3, [2])},
    )
    assert decode_tiff(build_tiff(tags, chunks)) == (w, h, 3, pix)


def test_planar_rgb_with_predictor2_and_deflate():
    w, h = 5, 3
    pix = rgb_gradient(w, h)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w, 3)
    chunks = []
    for p in range(3):
        plane = arr[:, :, p].astype(np.int16)
        diff = plane.copy()
        diff[:, 1:] = (plane[:, 1:] - plane[:, :-1]) % 256
        chunks.append(zlib.compress(diff.astype(np.uint8).tobytes()))
    tags = gray_tags(
        w, h, h,
        over={258: (3, [8, 8, 8]), 262: (3, [2]), 277: (3, [3]),
              284: (3, [2]), 259: (3, [8]), 317: (3, [2])},
    )
    assert decode_tiff(build_tiff(tags, chunks)) == (w, h, 3, pix)


def _revbits(data: bytes) -> bytes:
    return bytes(int(f"{b:08b}"[::-1], 2) for b in data)


def test_fillorder2_bilevel_and_gray():
    w, h = 10, 3
    bits = [(x + y) % 2 for y in range(h) for x in range(w)]
    rows = b""
    for y in range(h):
        rowbits = bits[y * w : (y + 1) * w] + [0] * 6
        rows += bytes(
            int("".join(map(str, rowbits[i : i + 8])), 2) for i in range(0, 16, 8)
        )
    tags = gray_tags(w, h, h, over={258: (3, [1]), 266: (3, [2])})
    got = decode_tiff(build_tiff(tags, [_revbits(rows)]))
    assert got == (w, h, 1, bytes(255 * b for b in bits))
    # 8-bit gray: FillOrder reverses every raster byte too
    pix = gray_gradient(w, h)
    tags = gray_tags(w, h, h, over={266: (3, [2])})
    assert decode_tiff(build_tiff(tags, [_revbits(pix)])) == (w, h, 1, pix)


def test_fillorder2_lzw_compressed():
    """FillOrder applies to the stored (compressed) bytes — reverse the
    LZW stream's bytes and the decoder must undo it before code parsing."""
    w, h = 7, 4
    pix = gray_gradient(w, h)
    data = build_tiff(
        gray_tags(w, h, h, over={259: (3, [5]), 266: (3, [2])}),
        [_revbits(LzwEncoder().encode(pix))],
    )
    assert decode_tiff(data) == (w, h, 1, pix)


def test_gated_variants_raise_notimplemented():
    w, h = 2, 2
    pix = gray_gradient(w, h)
    gates = [
        {259: (3, [4])},             # CCITT G4
        {259: (3, [6])},             # old-style JPEG
        {284: (3, [2])},             # planar GRAY (planar is RGB-only)
        {317: (3, [3])},             # float predictor
        {339: (3, [3])},             # float samples
        {262: (3, [5])},             # CMYK
    ]
    for over in gates:
        with pytest.raises(NotImplementedError):
            decode_tiff(build_tiff(gray_tags(w, h, h, over=over), [pix]))


def test_hostile_inputs_valueerror_only():
    w, h = 4, 4
    good = build_tiff(gray_tags(w, h, h), [gray_gradient(w, h)])
    bad = [
        b"",
        b"II*\x00",
        b"II*\x00" + b"\xff" * 8,
        build_tiff(gray_tags(0, 4, 4), [b""]),
        build_tiff(gray_tags(4, 4, 4, over={256: (4, [1 << 16]), 257: (4, [1 << 16])}), [b"x"]),  # dims bound
        good[:20],
        good[:-6],
    ]
    for b in bad:
        with pytest.raises(ValueError):
            decode_tiff(b)


def test_mutation_fuzz_never_escapes():
    import random

    rng = random.Random(0x71FF)
    w, h = 8, 6
    pix = gray_gradient(w, h)
    seeds = [
        build_tiff(gray_tags(w, h, 3), [pix[: 3 * w], pix[3 * w :]]),
        build_tiff(gray_tags(w, h, h, over={259: (3, [5])}), [LzwEncoder().encode(pix)]),
        build_tiff(gray_tags(w, h, h, over={259: (3, [32773])}), [packbits_encode(pix)]),
    ]
    for seed in seeds:
        for _ in range(120):
            buf = bytearray(seed)
            for _ in range(rng.randint(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            try:
                decode_tiff(bytes(buf))
            except (ValueError, NotImplementedError):
                pass


def test_operator_wiring_sniff_and_decode():
    from deepseek_ocr_spark.operators.multimodal import _real_decode, sniff_image_meta

    w, h = 6, 5
    pix = gray_gradient(w, h)
    # orientation rides on tag 274
    data = build_tiff(gray_tags(w, h, h, over={274: (3, [6])}), [pix])
    assert sniff_image_meta(data) == ("tiff", w, h, 6)
    assert _real_decode(data) == (w, h, 1)
    # big-endian sniff too
    data_be = build_tiff(gray_tags(w, h, h), [pix], bo=">")
    assert sniff_image_meta(data_be) == ("tiff", w, h, 1)


def test_old_style_jpeg_interchange_format():
    """Compression 6 with a complete JFIF stream at
    JPEGInterchangeFormat (513/514) — the one old-JPEG form seen in the
    wild — routes through the JPEG kernel; dims crop to the IFD's."""
    from deepseek_ocr_spark.kernels import jpeg as jpeg_kernel
    from tests.test_pixels import gradient

    stream = jpeg_kernel.encode_jpeg_baseline(gradient(16, 8, 3))
    jw, jh, jc, jbuf = jpeg_kernel.decode_jpeg(stream)
    w, h = 14, 8  # crop narrower than the JPEG frame
    tags = gray_tags(
        w, h, h,
        over={258: (3, [8, 8, 8]), 262: (3, [6]), 277: (3, [3]),
              259: (3, [6]), 513: (4, [8]), 514: (4, [len(stream)])},
    )
    got = decode_tiff(build_tiff(tags, [stream]))
    arr = np.frombuffer(jbuf, np.uint8).reshape(jh, jw, 3)
    assert got == (w, h, 3, arr[:h, :w].tobytes())


def test_old_style_jpeg_without_pointer_stays_gated():
    pix = gray_gradient(2, 2)
    with pytest.raises(NotImplementedError, match="JPEGInterchangeFormat"):
        decode_tiff(build_tiff(gray_tags(2, 2, 2, over={259: (3, [6])}), [pix]))


def test_float32_gray_display_mapping():
    """SampleFormat 3: [0,1] floats scale to bytes with round-half-up;
    out-of-range and NaN clamp; WhiteIsZero inverts after mapping."""
    w, h = 5, 2
    vals = [0.0, 0.25, 0.5, 0.999, 1.0, -0.5, 2.0, float("nan"), 0.002, 0.998]
    raw = struct.pack("<" + "f" * 10, *vals)
    over = {258: (3, [32]), 339: (3, [3])}
    got = decode_tiff(build_tiff(gray_tags(w, h, h, over=over), [raw]))
    import math
    expect = bytes(
        int(math.floor(min(max(0.0 if v != v else v, 0.0), 1.0)
                       * 255.0 + 0.5))
        for v in [struct.unpack("<f", struct.pack("<f", x))[0] for x in vals]
    )
    assert got == (w, h, 1, expect)
    over[262] = (3, [0])
    got = decode_tiff(build_tiff(gray_tags(w, h, h, over=over), [raw]))
    assert got[3] == bytes(255 - b for b in expect)


def test_float32_rgb_deflate_big_endian():
    w, h = 3, 2
    vals = [((7 * i) % 11) / 10.0 for i in range(w * h * 3)]
    raw = struct.pack(">" + "f" * len(vals), *vals)
    over = {258: (3, [32] * 3), 262: (3, [2]), 277: (3, [3]),
            339: (3, [3] * 3), 259: (3, [8])}
    got = decode_tiff(
        build_tiff(gray_tags(w, h, h, over=over), [zlib.compress(raw)], bo=">")
    )
    import math
    f32 = [struct.unpack(">f", struct.pack(">f", v))[0] for v in vals]
    expect = bytes(int(math.floor(min(max(v, 0.0), 1.0) * 255.0 + 0.5))
                   for v in f32)
    assert got == (w, h, 3, expect)


def test_uint32_and_signed_samples_stay_gated():
    pix = gray_gradient(2, 2)
    with pytest.raises(NotImplementedError):
        decode_tiff(build_tiff(
            gray_tags(2, 2, 2, over={258: (3, [32])}), [pix]))
    with pytest.raises(NotImplementedError):
        decode_tiff(build_tiff(
            gray_tags(2, 2, 2, over={339: (3, [2])}), [pix]))
