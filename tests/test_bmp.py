"""BMP kernel: decoder pinned against hand-built files (row padding,
bottom-up vs top-down, palette, 24/32-bit), mutation fuzz, PIL
cross-parity in the codec-present lane."""

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.bmp import decode_bmp


def build_bmp(width, height, bpp, pixel_rows, palette=None, top_down=False):
    """pixel_rows: list of rows TOP-first; each row is raw bytes in the
    file's pixel format (palette indices / BGR / BGRX), unpadded."""
    row_bytes = ((width * bpp + 7) // 8 + 3) & ~3
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    pix_off = 14 + 40 + len(pal)
    body = bytearray()
    rows = pixel_rows if top_down else pixel_rows[::-1]
    for r in rows:
        body += r + bytes(row_bytes - len(r))
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, bpp, 0, len(body), 2835, 2835, len(palette or []), 0,
    )
    return bytes(hdr + info + pal + body)


PAL = [(250, 10, 20), (0, 128, 255), (7, 7, 7), (200, 200, 0)]


def test_palette_8bit_bottom_up_with_padding():
    # 3x2: rows padded from 3 to 4 bytes
    rows = [bytes([0, 1, 2]), bytes([3, 0, 1])]
    w, h, ch, buf = decode_bmp(build_bmp(3, 2, 8, rows, palette=PAL))
    assert (w, h, ch) == (3, 2, 3)
    got = [tuple(buf[3 * i : 3 * i + 3]) for i in range(6)]
    assert got == [PAL[0], PAL[1], PAL[2], PAL[3], PAL[0], PAL[1]]


def test_bgr24_and_top_down():
    rows = [bytes([10, 20, 30, 40, 50, 60]),  # two BGR pixels
            bytes([1, 2, 3, 4, 5, 6])]
    for td in (False, True):
        w, h, ch, buf = decode_bmp(build_bmp(2, 2, 24, rows, top_down=td))
        got = [tuple(buf[3 * i : 3 * i + 3]) for i in range(4)]
        assert got == [(30, 20, 10), (60, 50, 40), (3, 2, 1), (6, 5, 4)]


def test_bgrx32_drops_filler():
    rows = [bytes([10, 20, 30, 99, 40, 50, 60, 99])]
    w, h, ch, buf = decode_bmp(build_bmp(2, 1, 32, rows))
    assert [tuple(buf[0:3]), tuple(buf[3:6])] == [(30, 20, 10), (60, 50, 40)]


def test_rle8_runs_eol_delta_absolute():
    """Hand-built RLE8: encoded run, absolute mode (word-padded), delta
    skip (cells stay index 0), end-of-line, end-of-bitmap."""
    rle = bytes([
        3, 1,               # run: 3x palette[1]
        0, 3, 2, 3, 2, 0,   # absolute: 3 literals (2,3,2) + explicit pad
        0, 0,               # end of line
        0, 2, 2, 0,         # delta: skip 2 cells on row 1
        2, 3,               # run: 2x palette[3]
        0, 1,               # end of bitmap
    ])
    pix_off = 14 + 40 + 4 * 4
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rle), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 8, 1, len(rle), 0, 0, 4, 0)
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in PAL)
    w, h, ch, buf = decode_bmp(hdr + info + pal + rle)
    assert (w, h, ch) == (6, 2, 3)
    grid = [tuple(buf[3 * i : 3 * i + 3]) for i in range(12)]
    # bottom-up: stored row 0 is DISPLAY row 1
    assert grid[6:12] == [PAL[1]] * 3 + [PAL[2], PAL[3], PAL[2]]
    assert grid[0:6] == [PAL[0], PAL[0], PAL[3], PAL[3], PAL[0], PAL[0]]


def test_rle4_runs_eol_delta_absolute():
    """Hand-built RLE4: encoded run alternating nibbles, absolute mode
    (nibble-packed, word-padded), delta skip, end-of-line, end-of-bitmap."""
    rle = bytes([
        3, 0x12,            # run: 3 px alternating 1,2,1
        0, 3, 0x23, 0x20,   # absolute: 3 literals (2,3,2); 2 nibble bytes,
                            # already word-aligned so no pad byte
        0, 0,               # end of line
        0, 2, 2, 0,         # delta: skip 2 cells on row 1
        2, 0x30,            # run: 2 px alternating 3,0 -> (3,0)... cnt=2: 3,0
        0, 1,               # end of bitmap
    ])
    pix_off = 14 + 40 + 4 * 4
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rle), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 4, 2, len(rle), 0, 0, 4, 0)
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in PAL)
    w, h, ch, buf = decode_bmp(hdr + info + pal + rle)
    assert (w, h, ch) == (6, 2, 3)
    grid = [tuple(buf[3 * i : 3 * i + 3]) for i in range(12)]
    # bottom-up: stored row 0 is DISPLAY row 1
    assert grid[6:12] == [PAL[1], PAL[2], PAL[1], PAL[2], PAL[3], PAL[2]]
    assert grid[0:6] == [PAL[0], PAL[0], PAL[3], PAL[0], PAL[0], PAL[0]]


def test_uncompressed_4bit_and_1bit():
    # 4-bit, 3 px wide (odd -> low nibble of 2nd byte unused)
    rows = [bytes([0x01, 0x20]), bytes([0x32, 0x10])]
    w, h, ch, buf = decode_bmp(build_bmp(3, 2, 4, rows, palette=PAL))
    got = [tuple(buf[3 * i : 3 * i + 3]) for i in range(6)]
    assert got == [PAL[0], PAL[1], PAL[2], PAL[3], PAL[2], PAL[1]]
    # 1-bit, 10 px wide (2 bytes/row packed MSB-first)
    rows = [bytes([0b10110000, 0b01000000]), bytes([0b00000001, 0b10000000])]
    w, h, ch, buf = decode_bmp(build_bmp(10, 2, 1, rows, palette=PAL[:2]))
    got = [buf[3 * i : 3 * i + 3] == bytes(PAL[1]) for i in range(20)]
    assert got[:10] == [True, False, True, True] + [False] * 5 + [True]
    assert got[10:] == [False] * 7 + [True, True, False]


def test_unsupported_and_corrupt():
    with pytest.raises(ValueError):  # RLE4 flag on an 8-bit image
        bad = bytearray(build_bmp(2, 2, 8, [b"\x00\x00", b"\x00\x00"], palette=PAL))
        bad[30] = 2
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + bytes(20))
    with pytest.raises(ValueError):
        decode_bmp(build_bmp(3, 2, 8, [b"\x00\x00\x00"] * 2, palette=PAL)[:-5])
    rng = np.random.RandomState(6)
    base = build_bmp(4, 3, 24, [bytes(range(12))] * 3)
    for trial in range(300):
        data = bytearray(base)
        if trial % 2:
            for _ in range(rng.randint(1, 5)):
                data[rng.randint(0, len(data))] = rng.randint(0, 256)
        else:
            data = data[: rng.randint(2, len(data))]
        try:
            decode_bmp(bytes(data))
        except (ValueError, NotImplementedError):
            pass  # only allowed failures


def test_mutation_fuzz_low_bpp_and_rle4():
    """Hostile-input contract for the r6 lanes: corrupt/truncated/inserted
    variants of RLE4, 4-bit and 1-bit files raise ValueError (or
    NotImplementedError for flipped headers) only."""
    rle = bytes([3, 0x12, 0, 3, 0x23, 0x20, 0, 0, 0, 2, 2, 0, 2, 0x30, 0, 1])
    pix_off = 14 + 40 + 4 * 4
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rle), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 4, 2, len(rle), 0, 0, 4, 0)
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in PAL)
    bases = [
        hdr + info + pal + rle,
        build_bmp(3, 2, 4, [bytes([0x01, 0x20]), bytes([0x32, 0x10])], palette=PAL),
        build_bmp(10, 2, 1,
                  [bytes([0b10110000, 0b01000000]), bytes([0b00000001, 0b10000000])],
                  palette=PAL[:2]),
    ]
    rng = np.random.RandomState(7)
    for base in bases:
        for trial in range(200):
            data = bytearray(base)
            mode = trial % 3
            if mode == 0:
                for _ in range(rng.randint(1, 5)):
                    data[rng.randint(0, len(data))] = rng.randint(0, 256)
            elif mode == 1:
                data = data[: rng.randint(2, len(data))]
            else:
                at = rng.randint(0, len(data))
                data = (data[:at]
                        + bytes(rng.randint(0, 256, rng.randint(1, 20),
                                            dtype=np.uint8).tolist())
                        + data[at:])
            try:
                decode_bmp(bytes(data))
            except (ValueError, NotImplementedError):
                pass  # only allowed failures


def test_real_decode_handles_bmp_in_sandbox():
    from deepseek_ocr_spark.operators.multimodal import _real_decode

    data = build_bmp(3, 2, 24, [bytes(range(9)), bytes(range(9))])
    assert _real_decode(data) == (3, 2, 3)


def test_decode_matches_pil():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(8)
    arr = rng.randint(0, 255, (11, 13, 3), dtype=np.uint8)
    out = io.BytesIO()
    PIL_Image.fromarray(arr).save(out, "BMP")
    w, h, ch, buf = decode_bmp(out.getvalue())
    assert (w, h, ch) == (13, 11, 3)
    assert buf == arr.tobytes()


def test_low_bpp_decode_matches_pil():
    """4-bit / 1-bit / RLE4 hand-built files, cross-checked against PIL
    (codec-present lane; the in-sandbox expectations live in
    test_uncompressed_4bit_and_1bit / test_rle4_runs_eol_delta_absolute)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    files = [
        build_bmp(3, 2, 4, [bytes([0x01, 0x20]), bytes([0x32, 0x10])], palette=PAL),
        build_bmp(
            10, 2, 1,
            [bytes([0b10110000, 0b01000000]), bytes([0b00000001, 0b10000000])],
            palette=PAL[:2],
        ),
    ]
    for data in files:
        w, h, ch, buf = decode_bmp(data)
        im = PIL_Image.open(io.BytesIO(data)).convert("RGB")
        assert (w, h) == im.size
        assert buf == im.tobytes()
