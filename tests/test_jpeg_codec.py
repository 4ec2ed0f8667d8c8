"""JPEG lane of the non-PNG pixel path.  Baseline (r5), progressive
(r5), arithmetic-coded (r7, kernels/jparith.py), lossless (r7, SOF3),
12-bit (r7) and DHP-hierarchical (r7) decode are all REAL in-sandbox,
so the decode tests here run UN-skipped; the codec gate
(NotImplementedError naming the missing codec) now covers only residual
JPEG processes (differential progressive/lossless frames, 12-bit
arithmetic, bare differential SOFs), float/exotic TIFF and lossy WebP.
PIL cross-parity lives in tests/test_jpeg_kernel.py's codec-present
lane."""

import importlib.util
import struct

import pytest

from deepseek_ocr_spark.kernels import jpeg as jpeg_kernel
from deepseek_ocr_spark.kernels import pixels

_HAS_PIL = importlib.util.find_spec("PIL") is not None


def _jpeg_bytes(w, h, quality=95):
    from tests.test_pixels import gradient

    return jpeg_kernel.encode_jpeg_baseline(gradient(w, h), quality=quality)


def test_real_decode_jpeg_in_sandbox():
    """_real_decode handles baseline JPEG with NO native codec present."""
    from deepseek_ocr_spark.operators.multimodal import _real_decode

    assert _real_decode(_jpeg_bytes(24, 16)) == (24, 16, 3)


def test_real_decode_arith_jpeg_in_sandbox():
    """_real_decode handles ARITHMETIC-coded JPEG (SOF9/SOF10) with NO
    native codec present — the r7 gate closure at the operator layer
    (PIL itself raises on these streams, so this exceeds the PIL path)."""
    from tests.test_pixels import gradient

    from deepseek_ocr_spark.operators.multimodal import _real_decode

    img = gradient(24, 16)
    seq = jpeg_kernel.encode_jpeg_arith(img, quality=90)
    prog = jpeg_kernel.encode_jpeg_arith(img, quality=90, progressive=True)
    assert _real_decode(seq) == (24, 16, 3)
    assert _real_decode(prog) == (24, 16, 3)


def test_region_crops_emit_jpeg(spark):
    """fmt="jpeg" emits the reference's actual sink format (pdf.py:183-190
    writes JPEG crops): output bytes are a decodable baseline JPEG of the
    cropped region's dimensions — runs in-sandbox via the stdlib codec."""
    from deepseek_ocr_spark.operators.vision import region_crops
    from tests.test_pixels import gradient

    img = gradient(50, 40)
    df = spark.createDataFrame(
        [(7, pixels.encode_png(img), 0, 5, 5, 25, 30)],
        "doc_id LONG, png BINARY, region_ix INT, x1 INT, y1 INT, x2 INT, y2 INT",
    )
    rows = region_crops(df, fmt="jpeg").collect()
    assert len(rows) == 1 and "crop_jpeg" in rows[0].asDict()
    data = bytes(rows[0]["crop_jpeg"])
    assert data[:2] == b"\xff\xd8"
    w, h, ch, _buf = jpeg_kernel.decode_jpeg(data)
    assert (w, h, ch) == (20, 25, 3)


def test_encode_jpeg_drops_alpha():
    from deepseek_ocr_spark.operators.vision import encode_jpeg
    from tests.test_pixels import gradient

    data = encode_jpeg(gradient(12, 9, 4))  # RGBA → RGB
    assert jpeg_kernel.decode_jpeg(data)[:3] == (12, 9, 3)
    data = encode_jpeg(gradient(12, 9, 2))  # LA → L
    assert jpeg_kernel.decode_jpeg(data)[:3] == (12, 9, 1)


def _hierarchical_stub() -> bytes:
    """A bare SOF5 with no DHP — an invalid hierarchical fragment that
    exercises the residual-SOF gate path.  (DHP-led hierarchical, SOF9
    arithmetic and SOF3 lossless are all NATIVE as of r7.)"""
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += struct.pack(">BBH", 0xFF, 0xC5, len(sof) + 2) + sof
    return bytes(out)


@pytest.mark.skipif(
    _HAS_PIL, reason="codec present — the gate path is for codec-less environments"
)
def test_codec_gate_raises_clearly_without_codec():
    """The narrowed sandbox gate: a bare differential SOF outside a DHP
    hierarchical sequence (or any other residual JPEG process) and
    formats outside the native matrix (e.g. lossy WebP) still route to
    the native-codec gate (PNG / every sequential+progressive JPEG
    process incl. arithmetic, lossless, 12-bit and DHP-hierarchical /
    GIF / BMP incl. RLE / mainstream TIFF incl. fax / VP8L WebP are all
    native as of r7); corrupt streams raise ValueError (a decoder
    error, not a gate)."""
    from deepseek_ocr_spark.operators.multimodal import _real_decode, codecs_available

    assert not codecs_available()
    with pytest.raises(NotImplementedError, match="native codec"):
        _real_decode(_hierarchical_stub())
    with pytest.raises(NotImplementedError, match="native codec"):
        _real_decode(b"RIFF\x00\x00\x00\x00WEBPVP8 " + bytes(20))
    with pytest.raises(ValueError):
        _real_decode(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError):
        _real_decode(b"GIF89a" + bytes(20))
    with pytest.raises(ValueError):
        _real_decode(b"BM" + bytes(30))  # corrupt BMP, native decode
