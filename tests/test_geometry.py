"""O-8 geometry sink: SVG reconstruction from geometry-dict outputs, with
per-element skip behavior matching the reference's try/except policy."""

import json

from pyspark.sql import functions as F

from deepseek_ocr_spark.pipeline.geometry import geometry_figures

GEO = {
    "Line": {
        "line": [
            "(0, 0) -- (10, 5)",
            "(-3.5, 2) -- (4, -7.25)",
            "garbage segment",        # must skip, not crash (ref try/except)
        ],
        "line_type": ["--", "-", "-"],
        "line_endpoint": ["A: (0, 0)", "B: (10, 5)", "broken endpoint"],
    },
    "Circle": {"circle_center": ["O: (1, -2)"], "radius": [3.5]},
}

EXPECTED = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="-15 -15 30 30" '
    'width="600" height="600"><g transform="scale(1,-1)">'
    '<line x1="0" y1="0" x2="10" y2="5" stroke="black" stroke-width="0.1"/>'
    '<circle cx="0" cy="0" r="0.15" fill="black"/>'
    '<circle cx="10" cy="5" r="0.15" fill="black"/>'
    '<line x1="-3.5" y1="2" x2="4" y2="-7.25" stroke="black" stroke-width="0.1"/>'
    '<circle cx="-3.5" cy="2" r="0.15" fill="black"/>'
    '<circle cx="4" cy="-7.25" r="0.15" fill="black"/>'
    '<circle cx="1" cy="-2" r="3.5" fill="none" stroke="black" stroke-width="0.1"/>'
    "</g>"
    '<text x="0" y="-0" font-size="0.8">A</text>'
    '<text x="10" y="-5" font-size="0.8">B</text>'
    "</svg>"
)


def test_geometry_svg(spark):
    rows = [
        ("u://geo", json.dumps(GEO)),
        ("u://text", "plain markdown, not geometry"),
        ("u://badjson", '{"Line": not json'),
        ("u://nolines", json.dumps({"Line": {"line_endpoint": ["A: (0, 0)"]}})),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["url"]: bytes(r["svg"]).decode() for r in geometry_figures(df).collect()}
    # only the geometry row emits a figure (reference gate: line_type present)
    assert set(got) == {"u://geo"}
    assert got["u://geo"] == EXPECTED


def test_geometry_python_literal_dict(spark):
    """The reference eval()s its geometry payload (run_dpsk_ocr_image.py:253)
    and so accepts single-quoted Python dicts — repr(GEO) must produce the
    SAME figure bytes as json.dumps(GEO), and Python None literals map to
    null (a None radius drops that circle, not the row)."""
    geo_none = {
        "Line": {"line": ["(0, 0) -- (1, 1)"], "line_type": ["-"],
                 "line_endpoint": []},
        "Circle": {"circle_center": ["O: (1, -2)"], "radius": None},
    }
    rows = [
        ("u://py", repr(GEO)),            # single-quoted Python spelling
        ("u://json", json.dumps(GEO)),
        ("u://pynone", repr(geo_none)),   # bare None inside the literal
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["url"]: bytes(r["svg"]).decode() for r in geometry_figures(df).collect()}
    assert got["u://py"] == got["u://json"] == EXPECTED
    assert "(1, -2)" not in got["u://pynone"]  # None radius → circle skipped
    assert '<line x1="0" y1="0" x2="1" y2="1"' in got["u://pynone"]
