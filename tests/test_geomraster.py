"""Raster tier of the O-8 geometry sink (kernels/geomraster.py +
pipeline.geometry.geometry_figures_png): expected-pixel checks computed
from the world→pixel mapping by hand (never from the module's own
transform helpers), byte determinism, and task-retry identity through
Spark."""

import hashlib

import pytest

from deepseek_ocr_spark.kernels.geomraster import rasterize_geometry_svg
from deepseek_ocr_spark.kernels.pixels import decode_png
from deepseek_ocr_spark.pipeline.geometry import (
    geometry_figures,
    geometry_figures_png,
)

GEO_TEXT = (
    '{"Line": {"line": ["(0, 0) -- (5, 0)"], "line_type": ["--"], '
    '"line_endpoint": ["A: (0, 0)", "B: (5, 0)"]}, '
    '"Circle": {"circle_center": ["O: (-5, -5)"], "radius": [3.0]}}'
)


def _svg_of(spark, text=GEO_TEXT):
    df = spark.createDataFrame([("u://geo", text)], "url STRING, text STRING")
    return bytes(geometry_figures(df).collect()[0]["svg"]).decode()


def _pix(png):
    w, h, ch, buf = decode_png(png)
    assert (w, h, ch) == (600, 600, 1)
    return bytes(buf)


def test_raster_expected_pixels(spark):
    # mapping (by hand): px = (x+15)*20, py = (15-y)*20 at size 600
    png = rasterize_geometry_svg(_svg_of(spark))
    p = _pix(png)

    def at(xw, yw):
        return p[int((15 - yw) * 20) * 600 + int((xw + 15) * 20)]

    assert at(2.5, 0) == 0        # on the segment
    assert at(2.5, 1) == 255      # 20 px above a 1 px-half-width stroke
    assert at(0, 0) == 0          # endpoint dot (r = 3 px)
    assert at(5, 0) == 0          # other endpoint dot
    assert at(-5, -2) == 0        # circle ring: (-5,-5)+r3 topmost point
    assert at(-5, -5) == 255      # circle interior unfilled
    assert p[0] == 255            # canvas corner clean
    # label "A" near world (0,0): some ink inside the glyph box
    x0, y0 = int(15 * 20), int(15 * 20)
    box = [p[(y0 + r) * 600 + (x0 + c)] for r in range(18) for c in range(12)]
    assert 0 in box


def test_raster_deterministic_and_spark_retry_identical(spark):
    a = rasterize_geometry_svg(_svg_of(spark))
    b = rasterize_geometry_svg(_svg_of(spark))
    assert a == b
    df = spark.createDataFrame(
        [("u://1", GEO_TEXT), ("u://2", "not geometry"), ("u://3", GEO_TEXT)],
        "url STRING, text STRING",
    ).repartition(3)
    runs = []
    for _ in range(2):  # fresh plan each time — retry/executor identity
        rows = {r["url"]: bytes(r["png"]) for r in geometry_figures_png(df).collect()}
        runs.append({u: hashlib.md5(b).hexdigest() for u, b in rows.items()})
    assert runs[0] == runs[1]
    assert set(runs[0]) == {"u://1", "u://3"}  # non-geometry row dropped
    assert runs[0]["u://1"] == runs[0]["u://3"] == hashlib.md5(a).hexdigest()


def test_raster_rejects_non_scene_svg():
    with pytest.raises(ValueError):
        rasterize_geometry_svg("<svg></svg>")


def test_raster_unknown_glyphs_skipped(spark):
    text = (
        '{"Line": {"line": ["(0, 0) -- (1, 1)"], "line_type": ["solid"], '
        '"line_endpoint": ["\u03b1: (0, 0)"]}, "Circle": null}'
    )
    png = rasterize_geometry_svg(_svg_of(spark, text))
    assert _pix(png)  # renders, unknown glyph silently skipped
