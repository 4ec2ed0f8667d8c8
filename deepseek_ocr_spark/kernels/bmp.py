"""BMP decoder — stdlib + numpy, uncompressed BI_RGB 8/24/32-bit.

The last raster format in the O-3 image-load matrix (PNG r3; JPEG
baseline+progressive, GIF r5): BITMAPFILEHEADER + BITMAPINFOHEADER (or
larger V4/V5 headers — only the core fields are read), bottom-up or
top-down row order, 4-byte row padding, 8-bit palette (BGRX entries),
24-bit BGR and 32-bit BGRX pixels, all expanded to RGB.  RLE compression
and 1/4-bit depths raise NotImplementedError (→ the PIL codec gate);
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
