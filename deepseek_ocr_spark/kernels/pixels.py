"""Pure-stdlib pixel kernel: PNG codec + the reference's pixel geometry ops.

Retires the round-1/2 pixel-stub substitution: PNG decode/encode is real
(zlib is stdlib), so Gundam tile crops, the padded global view, EXIF
transposes, and region crops all run on actual pixel grids — no PIL/cv2.

Reference parity targets (cited per function):
- dynamic_preprocess crop loop — image_process.py:44-83
- ImageOps.pad global view      — image_process.py:386-388
- ImageOps.exif_transpose       — run_dpsk_ocr_image.py:33
- region crop + save            — run_dpsk_ocr_image.py:107-108

DOCUMENTED SUBSTITUTION (the one remaining numerics gate): PIL's default
``Image.resize`` filter is bicubic; this kernel resizes with deterministic
center-sample NEAREST (exact integer arithmetic, identical on every
platform). All GEOMETRY — contain/round sizing, centering offsets, tile
grids, crop boxes, fill color — reproduces PIL's arithmetic exactly
(``round`` here is Python banker's rounding, same builtin PIL calls);
only the interpolation kernel differs, and every test computes expected
pixels independently of this module's resize.

An image in this module is the tuple (w, h, c, buf) with ``buf`` a
bytes-like of length w*h*c, rows top-down, channels interleaved, 8 bits
per sample.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type → channel count (8-bit depth only)
_CT_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

Image = tuple[int, int, int, bytes]


# --- PNG decode -----------------------------------------------------------------


def decode_png(data: bytes) -> Image:
    """Decode an 8-bit non-interlaced PNG (gray/RGB/palette/gray+A/RGBA).

    Palette images are expanded to RGB. Raises ValueError on ANY malformed
    or unsupported input (zlib/struct errors are normalized to ValueError)
    — callers on hostile corpora catch one exception type and the bad
    payload drops a row instead of failing the task."""
    try:
        return _decode_png(data)
    except ValueError:
        raise
    except (zlib.error, struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed PNG: {e}") from e


def _decode_png(data: bytes) -> Image:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        chunk = data[i + 8 : i + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            plte = bytes(chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    if w is None or not w or not h:
        raise ValueError("PNG missing/empty IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _CT_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _CT_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    buf = _unfilter(raw, w, h, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(w * h * 3)
        for px in range(w * h):
            p = buf[px] * 3
            rgb[px * 3 : px * 3 + 3] = plte[p : p + 3]
        return (w, h, 3, bytes(rgb))
    return (w, h, ch, bytes(buf))


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> bytearray:
    """Reverse PNG scanline filters 0-4 (spec §6); bpp = ch at depth 8."""
    stride = w * ch
    out = bytearray(stride * h)
    prev_row_start = -1
    for y in range(h):
        f = raw[y * (stride + 1)]
        rs = y * (stride + 1) + 1
        os = y * stride
        line = bytearray(raw[rs : rs + stride])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            if prev_row_start >= 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_row_start + x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = out[prev_row_start + x] if prev_row_start >= 0 else 0
                line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = out[prev_row_start + x] if prev_row_start >= 0 else 0
                c = (
                    out[prev_row_start + x - ch]
                    if (prev_row_start >= 0 and x >= ch)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[os : os + stride] = line
        prev_row_start = os
    return out


# --- PNG encode -----------------------------------------------------------------

_CHANNELS_CT = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(img: Image, filter_type: int = 0) -> bytes:
    """Encode to PNG with a single scanline filter type (0-4) on every row.

    Filter 0 is the deterministic default; the other filters exist so tests
    exercise every _unfilter branch against a reference pattern."""
    w, h, ch, buf = img
    if ch not in _CHANNELS_CT:
        raise ValueError(f"unsupported channel count {ch}")
    if len(buf) != w * h * ch:
        raise ValueError("buffer length != w*h*c")
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        row = buf[y * stride : (y + 1) * stride]
        prev = buf[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:
            raw += bytes(
                (row[x] - (row[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 2:
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif filter_type == 3:
            raw += bytes(
                (row[x] - (((row[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 4:
            line = bytearray()
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line.append((row[x] - pr) & 0xFF)
            raw += line
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_CT[ch], 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


# --- geometry ops ---------------------------------------------------------------


def crop(img: Image, box: tuple[int, int, int, int]) -> Image:
    """PIL Image.crop parity (run_dpsk_ocr_image.py:107): box = (x1, y1,
    x2, y2), out-of-bounds regions are zero-filled."""
    w, h, ch, buf = img
    x1, y1, x2, y2 = box
    cw, chh = x2 - x1, y2 - y1
    if cw <= 0 or chh <= 0:
        raise ValueError(f"empty crop box {box}")
    out = bytearray(cw * chh * ch)
    for y in range(max(y1, 0), min(y2, h)):
        sx1, sx2 = max(x1, 0), min(x2, w)
        if sx1 >= sx2:
            continue
        src = (y * w + sx1) * ch
        dst = ((y - y1) * cw + (sx1 - x1)) * ch
        out[dst : dst + (sx2 - sx1) * ch] = buf[src : src + (sx2 - sx1) * ch]
    return (cw, chh, ch, bytes(out))


def resize_nearest(img: Image, dw: int, dh: int) -> Image:
    """Deterministic center-sample nearest resize (see module docstring:
    the interpolation-kernel substitution for PIL bicubic)."""
    w, h, ch, buf = img
    if dw <= 0 or dh <= 0:
        raise ValueError(f"bad target size {dw}x{dh}")
    if (dw, dh) == (w, h):
        return img
    out = bytearray(dw * dh * ch)
    xmap = [min(w - 1, (2 * x + 1) * w // (2 * dw)) for x in range(dw)]
    for y in range(dh):
        sy = min(h - 1, (2 * y + 1) * h // (2 * dh))
        row = sy * w
        dst = y * dw * ch
        for x in range(dw):
            src = (row + xmap[x]) * ch
            out[dst : dst + ch] = buf[src : src + ch]
            dst += ch
    return (dw, dh, ch, bytes(out))


def new_image(w: int, h: int, ch: int, color: tuple[int, ...]) -> Image:
    if len(color) != ch:
        raise ValueError(f"color arity {len(color)} != channels {ch}")
    return (w, h, ch, bytes(color) * (w * h))


def paste(dst: Image, src: Image, x: int, y: int) -> Image:
    """PIL Image.paste at (x, y); source must fit."""
    dw, dh, dch, dbuf = dst
    sw, sh, sch, sbuf = src
    if dch != sch:
        raise ValueError("channel mismatch in paste")
    if x < 0 or y < 0 or x + sw > dw or y + sh > dh:
        raise ValueError("paste outside canvas")
    out = bytearray(dbuf)
    for row in range(sh):
        d = ((y + row) * dw + x) * dch
        s = row * sw * sch
        out[d : d + sw * sch] = sbuf[s : s + sw * sch]
    return (dw, dh, dch, bytes(out))


def contain_size(w: int, h: int, tw: int, th: int) -> tuple[int, int]:
    """PIL ImageOps.contain sizing arithmetic, bit for bit (builtin round =
    banker's rounding, exactly what PIL calls)."""
    im_ratio = w / h
    dest_ratio = tw / th
    if im_ratio != dest_ratio:
        if im_ratio > dest_ratio:
            new_h = round(h / w * tw)
            if new_h != th:
                return (tw, new_h)
        else:
            new_w = round(w / h * th)
            if new_w != tw:
                return (new_w, th)
    return (tw, th)


def pad(
    img: Image,
    size: tuple[int, int],
    color: tuple[int, ...],
    centering: tuple[float, float] = (0.5, 0.5),
) -> Image:
    """ImageOps.pad parity (image_process.py:386-388 global view): contain
    within ``size`` preserving aspect, paste centered on a ``color``
    canvas. Offset rounding matches PIL (builtin round)."""
    w, h, ch, _ = img
    tw, th = size
    cw, chh = contain_size(w, h, tw, th)
    resized = resize_nearest(img, cw, chh)
    if (cw, chh) == (tw, th):
        return resized
    canvas = new_image(tw, th, ch, color)
    if cw != tw:
        x = round((tw - cw) * max(0.0, min(centering[0], 1.0)))
        return paste(canvas, resized, x, 0)
    y = round((th - chh) * max(0.0, min(centering[1], 1.0)))
    return paste(canvas, resized, 0, y)


# EXIF orientation → pixel op (ImageOps.exif_transpose semantics,
# run_dpsk_ocr_image.py:33): value 1 is identity; 2-8 mirror/rotate.
def exif_transpose(img: Image, orientation: int) -> Image:
    w, h, ch, buf = img
    if orientation in (1, 0):
        return img
    if orientation not in range(2, 9):
        raise ValueError(f"bad EXIF orientation {orientation}")
    swap = orientation in (5, 6, 7, 8)
    ow, oh = (h, w) if swap else (w, h)
    out = bytearray(ow * oh * ch)
    for y in range(h):
        for x in range(w):
            if orientation == 2:   # mirror horizontal
                dx, dy = w - 1 - x, y
            elif orientation == 3:  # rotate 180
                dx, dy = w - 1 - x, h - 1 - y
            elif orientation == 4:  # mirror vertical
                dx, dy = x, h - 1 - y
            elif orientation == 5:  # transpose (mirror + rot270)
                dx, dy = y, x
            elif orientation == 6:  # rotate 90 CW
                dx, dy = h - 1 - y, x
            elif orientation == 7:  # transverse (mirror + rot90)
                dx, dy = h - 1 - y, w - 1 - x
            else:                   # 8: rotate 270 CW
                dx, dy = y, w - 1 - x
            s = (y * w + x) * ch
            d = (dy * ow + dx) * ch
            out[d : d + ch] = buf[s : s + ch]
    return (ow, oh, ch, bytes(out))


# --- the reference's composite pixel flows --------------------------------------


def dynamic_tiles(img: Image, nw: int, nh: int, image_size: int) -> list[Image]:
    """dynamic_preprocess crop loop (image_process.py:44-83): resize to
    (nw*image_size, nh*image_size), then crop row-major image_size tiles.
    The (nw, nh) plan comes from kernels.tiling.tile_plan — the same argmin
    the relational tile_boxes query proves against the oracle."""
    from deepseek_ocr_spark.kernels.tiling import tile_boxes

    resized = resize_nearest(img, nw * image_size, nh * image_size)
    # grid arithmetic lives ONCE, in tiling.tile_boxes (the same boxes the
    # oracle-checked relational tile_boxes query derives)
    return [crop(resized, box) for box in tile_boxes(nw, nh, image_size)]


def to_tensor_normalized(
    img: Image,
    mean: tuple[float, ...] = (0.5, 0.5, 0.5),
    std: tuple[float, ...] = (0.5, 0.5, 0.5),
) -> list[list[list[float]]]:
    """ImageTransform analog (image_process.py:93-107, O-15): ToTensor
    (uint8 → float in [0,1], CHW layout) + Normalize((x - mean) / std).
    Exact arithmetic: x/255 is correctly-rounded IEEE division and the
    mean/std ops are single IEEE ops, so values are bit-reproducible —
    the deterministic contract a distributed engine needs from its
    preprocessing (same bytes → same floats on every executor)."""
    w, h, ch, buf = img
    if len(mean) != ch or len(std) != ch:
        raise ValueError(f"mean/std arity != channels {ch}")
    out = []
    for c in range(ch):
        m, sd = mean[c], std[c]
        plane = [
            [(buf[(y * w + x) * ch + c] / 255.0 - m) / sd for x in range(w)]
            for y in range(h)
        ]
        out.append(plane)
    return out


# global-view fill = tuple(int(mean*255)) with mean 0.5 (image_process.py:387)
PAD_FILL = 127


def global_view(img: Image, base_size: int) -> Image:
    """The padded global view (image_process.py:386-388): ImageOps.pad to
    (base_size, base_size) with the normalization-mean gray fill."""
    ch = img[2]
    return pad(img, (base_size, base_size), (PAD_FILL,) * ch)
