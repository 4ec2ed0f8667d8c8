"""Codec-present lane for the non-PNG pixel path: _real_decode on an
actual JPEG and JPEG region-crop emission. Runs ONLY where a native codec
(PIL) is importable (a codec-present CI image / real cluster) and
self-skips in this codec-less sandbox — same gate style as test_iceberg,
so the gate in operators/multimodal.py / operators/vision.py is exercised
code on both sides."""

import importlib.util
import io

import pytest

_HAS_PIL = importlib.util.find_spec("PIL") is not None
_SKIP = pytest.mark.skipif(
    not _HAS_PIL,
    reason="PIL not on this image (sandbox); the codec-present CI lane runs this test",
)


def _jpeg_bytes(w, h):
    from PIL import Image as PILImage

    from tests.test_pixels import gradient

    img = gradient(w, h)
    pim = PILImage.frombytes("RGB", (w, h), img[3])
    out = io.BytesIO()
    pim.save(out, "JPEG", quality=95)
    return out.getvalue()


@_SKIP
def test_real_decode_jpeg():
    from deepseek_ocr_spark.operators.multimodal import _real_decode, codecs_available

    assert codecs_available()
    assert _real_decode(_jpeg_bytes(24, 16)) == (24, 16, 3)


@_SKIP
def test_region_crops_emit_jpeg(spark):
    """fmt="jpeg" emits the reference's actual sink format (pdf.py:183-190
    writes JPEG crops): output bytes are a decodable JPEG of the cropped
    region's dimensions."""
    from PIL import Image as PILImage

    from deepseek_ocr_spark.kernels import pixels
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
    with PILImage.open(io.BytesIO(data)) as im:
        assert (im.width, im.height) == (20, 25)


@pytest.mark.skipif(
    _HAS_PIL, reason="codec present — the gate path is for codec-less environments"
)
def test_codec_gate_raises_clearly_without_codec():
    """The sandbox side of the gate: non-PNG decode and JPEG encode raise a
    NotImplementedError that names the missing codec, never a bare
    ImportError mid-task."""
    from deepseek_ocr_spark.operators.multimodal import _real_decode, codecs_available
    from deepseek_ocr_spark.operators.vision import encode_jpeg
    from tests.test_pixels import gradient

    assert not codecs_available()
    with pytest.raises(NotImplementedError, match="native codec"):
        _real_decode(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(NotImplementedError, match="native codec"):
        encode_jpeg(gradient(4, 4))
