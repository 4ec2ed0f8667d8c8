"""GIF kernel: decoder pinned against a HAND-PACKED LZW bitstream (bits
derived on paper, module never consulted), round-tripped against an
independent test-local LZW encoder, interlace/offset/extension handling,
and PIL cross-parity in the codec-present lane."""

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.gif import decode_gif

# --- test-local GIF builder + independent LZW encoder ------------------------


def lzw_encode(min_size, pixels):
    """Independent GIF-LZW compressor (not the module's algorithm run
    backwards — written from the spec; the width bump lags the decoder's
    by one assigned code, the classic alignment rule)."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_size + 1
    emit(clear, width)
    cur = b""
    for p in pixels:
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = bytes([p])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def build_gif(sw, sh, palette, pixels, *, left=0, top=0, w=None, h=None,
              interlace=False, bg=0, gce=False, min_size=None):
    w = sw if w is None else w
    h = sh if h is None else h
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1) if n > 2 else 0
    size_field = 0
    while (2 << size_field) < n:
        size_field += 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, bg, 0)
    for c in palette:
        out += bytes(c)
    out += bytes(3 * ((2 << size_field) - n))  # pad table to 2^k entries
    if gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    ms = min_size if min_size is not None else max(2, size_field + 1)
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h,
                                 0x40 if interlace else 0)
    out += bytes([ms])
    data = lzw_encode(ms, pixels)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


PAL4 = [(10, 20, 30), (200, 0, 0), (0, 200, 0), (0, 0, 200)]


def test_hand_packed_bitstream():
    """2x2, 4-color palette, pixels [0,1,2,3]; LZW bytes 44 34 05 derived
    by hand (CLEAR,0,1,2 at 3 bits, 3 and END at 4 bits, LSB-first)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
    for c in PAL4:
        out += bytes(c)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out += bytes([2])  # min code size
    out += b"\x03\x44\x34\x05\x00\x3b"
    w, h, ch, buf = decode_gif(bytes(out))
    assert (w, h, ch) == (2, 2, 3)
    assert buf == b"".join(bytes(PAL4[i]) for i in (0, 1, 2, 3))


def test_roundtrip_via_independent_encoder():
    rng = np.random.RandomState(11)
    for trial, (w, h, ncol) in enumerate([(7, 5, 4), (40, 30, 16), (25, 25, 8)]):
        palette = [tuple(int(v) for v in rng.randint(0, 256, 3)) for _ in range(ncol)]
        pixels = [int(v) for v in rng.randint(0, ncol, w * h)]
        data = build_gif(w, h, palette, pixels)
        gw, gh, ch, buf = decode_gif(data)
        assert (gw, gh, ch) == (w, h, 3)
        expect = b"".join(bytes(palette[p]) for p in pixels)
        assert buf == expect, trial


def test_dictionary_growth_past_width_bumps():
    """A long repetitive stream drives the table through several width
    increases (the failure mode where encoder/decoder width rules differ
    by one code)."""
    rng = np.random.RandomState(3)
    w, h, ncol = 80, 60, 4
    palette = PAL4
    # repetitive-with-noise: grows long dictionary entries fast
    pixels = []
    while len(pixels) < w * h:
        run = [int(rng.randint(0, ncol))] * int(rng.randint(1, 30))
        pixels.extend(run)
    pixels = pixels[: w * h]
    data = build_gif(w, h, palette, pixels)
    assert decode_gif(data)[3] == b"".join(bytes(palette[p]) for p in pixels)


def test_interlaced_rows():
    w, h = 8, 9
    palette = PAL4
    natural = [(y + x) % 4 for y in range(h) for x in range(w)]
    order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s, h, st)]
    interlaced = [natural[y * w + x] for y in order for x in range(w)]
    data = build_gif(w, h, palette, interlaced, interlace=True)
    assert decode_gif(data)[3] == b"".join(bytes(palette[p]) for p in natural)


def test_frame_offset_composites_over_background():
    data = build_gif(4, 3, PAL4, [1, 2, 3, 1], left=1, top=1, w=2, h=2, bg=0, gce=True)
    w, h, ch, buf = decode_gif(data)
    grid = [tuple(buf[3 * i : 3 * i + 3]) for i in range(w * h)]
    assert grid[0] == PAL4[0]  # background
    assert grid[1 * 4 + 1] == PAL4[1] and grid[1 * 4 + 2] == PAL4[2]
    assert grid[2 * 4 + 1] == PAL4[3] and grid[2 * 4 + 2] == PAL4[1]


def test_corrupt_raises():
    for bad in (b"GIF89a", b"not a gif", b"GIF89a" + bytes(7),
                build_gif(2, 2, PAL4, [0, 1, 2, 3])[:-10]):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_huge_screen_dims_raise_value_error_before_allocating():
    """A ~40-byte header declaring a 65535x65535 logical screen must hit
    the 1<<28-pixel sanity bound (ValueError), never a 12.9 GB alloc /
    MemoryError escaping the hostile-input contract."""
    import struct as _s

    hdr = b"GIF89a" + _s.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
    data = hdr + bytes(6)  # 2-entry GCT
    with pytest.raises(ValueError):
        decode_gif(data)


def test_real_decode_handles_gif_in_sandbox():
    from deepseek_ocr_spark.operators.multimodal import _real_decode

    data = build_gif(5, 4, PAL4, [i % 4 for i in range(20)])
    assert _real_decode(data) == (5, 4, 3)


def test_decode_matches_pil():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)
    pim = PIL_Image.fromarray(arr).convert("P", palette=PIL_Image.ADAPTIVE)
    out = io.BytesIO()
    pim.save(out, "GIF")
    data = out.getvalue()
    with PIL_Image.open(io.BytesIO(data)) as im:
        expected = im.convert("RGB").tobytes()
    assert decode_gif(data)[3] == expected


def test_mutation_fuzz_raises_only_value_error():
    """Same hostile-input contract as the JPEG decoder: corrupt variants
    of a valid GIF raise ValueError only."""
    rng = np.random.RandomState(2)
    base = build_gif(8, 6, PAL4, [i % 4 for i in range(48)])
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
            decode_gif(bytes(data))
        except ValueError:
            pass
