"""BMP decoder — stdlib + numpy, uncompressed BI_RGB 8/24/32-bit.

The last raster format in the O-3 image-load matrix (PNG r3; JPEG
baseline+progressive, GIF r5): BITMAPFILEHEADER + BITMAPINFOHEADER (or
larger V4/V5 headers — only the core fields are read), bottom-up or
top-down row order, 4-byte row padding, 8-bit palette (BGRX entries),
24-bit BGR and 32-bit BGRX pixels, plus RLE8 runs (encoded/absolute
modes, end-of-line, delta skips), all expanded to RGB.  RLE4 and 1/4-bit
depths raise NotImplementedError (→ the PIL codec gate);
corrupt input raises ValueError only (the drop-rule contract shared with
the JPEG/GIF/MP4 kernels)."""

from __future__ import annotations

import struct

import numpy as np

from .pixels import Image


def decode_bmp(data: bytes) -> Image:
    try:
        return _decode_checked(data)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"corrupt BMP stream ({type(e).__name__})") from e


def _decode_rle8(stream: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8: (count, value) runs; escape 0 → 0=end-of-line, 1=end of
    bitmap, 2=delta (dx, dy — skipped cells stay 0), n≥3 = absolute run
    padded to a word boundary.  Rows are stored bottom-up like BI_RGB
    (the caller flips)."""
    out = np.zeros((height, width), np.uint8)
    x = y = pos = 0
    n = len(stream)
    while pos + 1 < n:
        cnt, val = stream[pos], stream[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= height or x + cnt > width:
                raise ValueError("RLE8 run outside bitmap")
            out[y, x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("truncated RLE8 delta")
            x += stream[pos]
            y += stream[pos + 1]
            pos += 2
            if x > width or y > height:
                raise ValueError("RLE8 delta outside bitmap")
        else:  # absolute mode: val literal pixels, word-aligned
            if y >= height or x + val > width or pos + val > n:
                raise ValueError("RLE8 absolute run outside bitmap")
            out[y, x : x + val] = np.frombuffer(stream, np.uint8, val, pos)
            x += val
            pos += val + (val & 1)
    raise ValueError("RLE8 stream missing end-of-bitmap")


def _decode_checked(data: bytes) -> Image:
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    (colors_used,) = struct.unpack("<I", data[46:50])
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dims {width}x{height}")
    top_down = height < 0
    height = abs(height)
    if compression == 1:  # BI_RLE8
        if bpp != 8:
            raise ValueError("RLE8 with non-8-bit depth")
        if width * height > 1 << 28:
            raise ValueError("BMP dims exceed sanity bound")
        idx = _decode_rle8(data[pix_off:], width, height)
        n_pal = colors_used or 256
        pal = np.frombuffer(data, np.uint8, count=n_pal * 4, offset=14 + hdr_size)
        pal = pal.reshape(n_pal, 4)[:, :3][:, ::-1]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if not top_down:
            rgb = rgb[::-1]
        return (width, height, 3, np.ascontiguousarray(rgb).tobytes())
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise NotImplementedError(f"BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP")
    if width * height > 1 << 28:
        raise ValueError("BMP dims exceed sanity bound")

    row_bytes = (width * bpp // 8 + 3) & ~3
    need = pix_off + row_bytes * height
    if need > len(data):
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, np.uint8, count=row_bytes * height, offset=pix_off)
    rows = raw.reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]

    if bpp == 8:
        n_pal = colors_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, np.uint8, count=n_pal * 4, offset=pal_off)
        pal = pal.reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX → RGB
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("palette index out of range")
        rgb = pal[idx]
    elif bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        rgb = px[:, :, ::-1]  # BGR → RGB
    else:  # 32
        px = rows[:, : width * 4].reshape(height, width, 4)
        rgb = px[:, :, :3][:, :, ::-1]  # BGRX → RGB
    return (width, height, 3, np.ascontiguousarray(rgb).tobytes())
