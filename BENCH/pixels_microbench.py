"""Microbench: numpy pixel lane vs the round-3 pure-Python oracle lane on
the 640-tile Gundam path (decode 1300x700 PNG -> resize to the tile grid ->
crop 640 tiles -> encode each tile + the padded global view).

Run:  PYTHONPATH=. python BENCH/pixels_microbench.py
Appends one JSON line; the latest run is summarized in BENCH/BASELINE.md.

The pure-Python lane uses the retained _py_* oracle functions plus the
test suite's scalar reference bicubic (tests/test_pixels.ref_resize_bicubic)
— byte-equal semantics to the numpy lane per tests/test_pixels.py, so the
speedup is like-for-like. Both lanes share the same zlib C compressor, so
the end-to-end number understates the pixel-op speedup; the JSON reports
both (whole path + pixel ops with encode/decode zlib excluded)."""

from __future__ import annotations

import json
import time

from deepseek_ocr_spark.kernels import pixels
from deepseek_ocr_spark.kernels.tiling import tile_boxes, tile_plan
from tests.test_pixels import gradient  # the canonical fixture formula


def py_crop(img, box):
    w, h, ch, buf = img
    x1, y1, x2, y2 = box
    cw, chh = x2 - x1, y2 - y1
    out = bytearray(cw * chh * ch)
    for y in range(max(y1, 0), min(y2, h)):
        sx1, sx2 = max(x1, 0), min(x2, w)
        src = (y * w + sx1) * ch
        dst = ((y - y1) * cw + (sx1 - x1)) * ch
        out[dst : dst + (sx2 - sx1) * ch] = buf[src : src + (sx2 - sx1) * ch]
    return (cw, chh, ch, bytes(out))


def py_encode(img, ft=0):
    import struct
    import zlib

    raw = pixels._py_filter_rows(img, ft)
    w, h, ch, _ = img

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, pixels._CHANNELS_CT[ch], 0, 0, 0)
    return (
        pixels.PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, pixels.PNG_ZLIB_LEVEL))
        + chunk(b"IEND", b"")
    )


def py_decode(data):
    """Decode forced through the pure-Python unfilter lane."""
    import struct
    import zlib

    assert data[:8] == pixels.PNG_SIG
    i, idat, w, h, ch = 8, bytearray(), None, None, None
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        chunk = data[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            w, h, _bd, ct, _c, _f, _il = struct.unpack(">IIBBBBB", chunk)
            ch = pixels._CT_CHANNELS[ct]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        i += 12 + length
    raw = zlib.decompress(bytes(idat))
    return (w, h, ch, bytes(pixels._py_unfilter(raw, w, h, ch)))


def run_numpy(png, nw, nh, level=pixels.PNG_ZLIB_LEVEL):
    img = pixels.decode_png(png)
    tiles = pixels.dynamic_tiles(img, nw, nh, 640)
    out = [pixels.encode_png(t, level=level) for t in tiles]
    out.append(pixels.encode_png(pixels.global_view(img, 1024), level=level))
    return len(out)


def run_python(png, nw, nh):
    from tests.test_pixels import ref_resize_bicubic

    img = py_decode(png)
    resized = ref_resize_bicubic(img, nw * 640, nh * 640)
    tiles = [py_crop(resized, b) for b in tile_boxes(nw, nh, 640)]
    out = [py_encode(t) for t in tiles]
    # global view: bicubic contain + paste (same semantics as pixels.pad)
    cw, chh = pixels.contain_size(img[0], img[1], 1024, 1024)
    rs = ref_resize_bicubic(img, cw, chh)
    canvas = pixels.new_image(1024, 1024, 3, (127,) * 3)
    gv = pixels._py_paste(canvas, rs, 0, round((1024 - chh) * 0.5))
    out.append(py_encode(gv))
    return len(out)


def run_numpy_pixops(img, nw, nh):
    """Pixel ops only (no codec) — isolates the vectorization win from the
    shared zlib C time."""
    tiles = pixels.dynamic_tiles(img, nw, nh, 640)
    gv = pixels.global_view(img, 1024)
    return len(tiles) + (gv is not None)


def run_python_pixops(img, nw, nh):
    from tests.test_pixels import ref_resize_bicubic

    resized = ref_resize_bicubic(img, nw * 640, nh * 640)
    tiles = [py_crop(resized, b) for b in tile_boxes(nw, nh, 640)]
    cw, chh = pixels.contain_size(img[0], img[1], 1024, 1024)
    rs = ref_resize_bicubic(img, cw, chh)
    canvas = pixels.new_image(1024, 1024, 3, (127,) * 3)
    gv = pixels._py_paste(canvas, rs, 0, round((1024 - chh) * 0.5))
    return len(tiles) + (gv is not None)


def main():
    img = gradient(1300, 700)
    # encode the fixture through the py lane so both sides decode the SAME
    # bytes (filter 0)
    png = py_encode(img)
    nw, nh = tile_plan(1300, 700, True)

    def best_of(fn, arg, n=3):
        b = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn(arg, nw, nh)
            b = min(b, time.time() - t0)
        return b

    t_np = best_of(run_numpy, png)
    # level-9 comparison point: the old sink default — encode-bound half of
    # the path (VERDICT r4 #7: the deflate level is a free knob on sinks)
    t_np_l9 = best_of(lambda a, w, h: run_numpy(a, w, h, level=9), png)
    t_py = best_of(run_python, png, n=1)  # the py lane is slow; once is plenty
    t_np_ops = best_of(run_numpy_pixops, img)
    t_py_ops = best_of(run_python_pixops, img, n=1)
    out = {
        "bench": "pixels_640_tile_path",
        "tiles": nw * nh,
        "zlib_level": pixels.PNG_ZLIB_LEVEL,
        "numpy_sec": round(t_np, 4),
        "numpy_sec_level9": round(t_np_l9, 4),
        "speedup_level6_vs_9": round(t_np_l9 / t_np, 2),
        "pure_python_sec": round(t_py, 4),
        "speedup_end_to_end": round(t_py / t_np, 1),
        "numpy_pixops_sec": round(t_np_ops, 4),
        "pure_python_pixops_sec": round(t_py_ops, 4),
        "speedup_pixops": round(t_py_ops / t_np_ops, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
