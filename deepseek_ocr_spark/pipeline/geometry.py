"""O-8: geometry figure sink (the last SURVEY §2 row).

The reference re-plots model outputs that parse as a geometry dict
(run_dpsk_ocr_image.py:251-301): ``eval(output)`` → ``Line.line`` segments
"(x0, y0) -- (x1, y1)" drawn with endpoint dots, ``Line.line_endpoint``
labels "A: (x, y)", optional ``Circle`` (centers "O: (x, y)" + radii) as
unfilled circles, on a fixed (-15, 15)² canvas, saved as ``geo.jpg``.

Substitutions (documented):
- matplotlib/JPEG → SVG binary column (no raster libs; same geometry);
- ``eval()`` → ``from_json`` with a Python-literal normalization fallback
  (same policy as the O-31 coords parser — eval of untrusted model output
  is an RCE). Double-quoted JSON parses directly; the reference's typical
  ``eval()`` input — a single-quoted Python dict, possibly with ``None`` —
  is normalized by swapping quotes and mapping the bare literals, still
  entirely in Catalyst. Caveats of the subset (both theoretical — labels
  in the reference grammar are single letters): an apostrophe INSIDE a
  label string defeats the quote swap and that row degrades to dropped,
  and a label that IS the word None/True/False gets literal-mapped after
  the quote swap (the reference's eval would keep it as a string);
- per-element try/except skips → regex-match gates (malformed segment or
  point strings drop silently, exactly the reference's behavior).

Reference quirk reproduced: the dashed/solid branch bodies are IDENTICAL
(image.py:270-274 draws line_type '--' exactly like solid), so line_type is
parsed but does not affect the drawing.

All parsing and SVG assembly is Catalyst expressions — no Python on the
data path. SVG y grows downward while the reference's axes grow upward, so
emitted y coordinates are negated (equivalent to matplotlib's orientation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_JSON_SCHEMA = (
    "Line struct<line: array<string>, line_type: array<string>, "
    "line_endpoint: array<string>>, "
    "Circle struct<circle_center: array<string>, radius: array<double>>"
)

_NUM = r"(-?[0-9]+(?:\.[0-9]+)?)"
_SEG_RE = rf"^\({_NUM}, {_NUM}\) -- \({_NUM}, {_NUM}\)$"
_PT_RE = rf"^(.+): \({_NUM}, {_NUM}\)$"

# geometry elements live inside a scale(1,-1) group (SVG y grows down,
# the reference's axes grow up) so coordinates pass through VERBATIM; text
# labels would mirror inside the flipped group, so they sit outside it with
# a string-negated y.
SVG_OPEN = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="-15 -15 30 30" '
    'width="600" height="600"><g transform="scale(1,-1)">'
)
SVG_MID = "</g>"
LINE_FMT = (
    '<line x1="%s" y1="%s" x2="%s" y2="%s" stroke="black" stroke-width="0.1"/>'
    '<circle cx="%s" cy="%s" r="0.15" fill="black"/>'
    '<circle cx="%s" cy="%s" r="0.15" fill="black"/>'
)
LABEL_FMT = '<text x="%s" y="%s" font-size="0.8">%s</text>'
CIRCLE_FMT = (
    '<circle cx="%s" cy="%s" r="%s" fill="none" stroke="black" '
    'stroke-width="0.1"/>'
)


def _neg(y: Column) -> Column:
    """String-level negation ("7.25" ↔ "-7.25") — avoids float re-rendering
    drift ("0" would become "-0.0" through a double round trip)."""
    return F.when(
        y.startswith("-"), y.substr(F.lit(2), F.length(y))
    ).otherwise(F.concat(F.lit("-"), y))


def _seg_elem(s: Column) -> Column:
    g = [F.regexp_extract(s, _SEG_RE, i) for i in range(1, 5)]
    elem = F.format_string(LINE_FMT, g[0], g[1], g[2], g[3], g[0], g[1], g[2], g[3])
    return F.when(g[0] != "", elem).otherwise(F.lit(""))


def _label_elem(s: Column) -> Column:
    label = F.regexp_extract(s, _PT_RE, 1)
    x = F.regexp_extract(s, _PT_RE, 2)
    y = F.regexp_extract(s, _PT_RE, 3)
    return F.when(
        x != "", F.format_string(LABEL_FMT, x, _neg(y), label)
    ).otherwise(F.lit(""))


def _circle_elem(center: Column, radius: Column) -> Column:
    x = F.regexp_extract(center, _PT_RE, 2)
    y = F.regexp_extract(center, _PT_RE, 3)
    return F.when(
        (x != "") & radius.isNotNull(),
        F.format_string(CIRCLE_FMT, x, y, radius.cast("string")),
    ).otherwise(F.lit(""))


def _pyliteral_to_json(text: Column) -> Column:
    """Single-quoted Python dict → the JSON subset: quote swap + bare
    literal mapping (None/True/False). String-level, Catalyst-only."""
    out = F.regexp_replace(text, "'", '"')
    out = F.regexp_replace(out, r"\bNone\b", "null")
    out = F.regexp_replace(out, r"\bTrue\b", "true")
    return F.regexp_replace(out, r"\bFalse\b", "false")


def geometry_svg_col(text: Column) -> Column:
    """Geometry-dict text → SVG string, NULL when the text is not a
    geometry output (no 'line_type', unparseable as JSON or as a
    single-quoted Python literal)."""
    g_json = F.from_json(text, GEO_JSON_SCHEMA)
    g_py = F.from_json(_pyliteral_to_json(text), GEO_JSON_SCHEMA)
    # JSON first; the Python-literal lane only engages when the strict
    # parse misses the gate (the reference accepts both spellings via eval)
    ok = g_json["Line"]["line_type"].isNotNull() & g_json["Line"]["line"].isNotNull()
    g = F.when(ok, g_json).otherwise(g_py)
    lines = F.concat_ws("", F.transform(g["Line"]["line"], _seg_elem))
    labels = F.concat_ws("", F.transform(g["Line"]["line_endpoint"], _label_elem))
    circles = F.concat_ws(
        "",
        F.zip_with(
            F.coalesce(g["Circle"]["circle_center"], F.array().cast("array<string>")),
            F.coalesce(g["Circle"]["radius"], F.array().cast("array<double>")),
            _circle_elem,
        ),
    )
    svg = F.concat(
        F.lit(SVG_OPEN), lines, circles, F.lit(SVG_MID), labels, F.lit("</svg>")
    )
    # the reference gate: only outputs containing line_type re-plot
    return F.when(
        g["Line"]["line_type"].isNotNull() & g["Line"]["line"].isNotNull(), svg
    )


def geometry_figures(df: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """rows with geometry-dict text → (key, svg binary); non-geometry rows
    are dropped (the reference only writes geo.jpg for parsing outputs)."""
    svg = geometry_svg_col(F.col(text_col))
    return (
        df.select(F.col(key_col).alias("url"), svg.alias("_svg"))
        .filter(F.col("_svg").isNotNull())
        .select("url", F.encode(F.col("_svg"), "UTF-8").alias("svg"))
    )


def geometry_figures_png(
    df: DataFrame, key_col: str = "url", text_col: str = "text", size: int = 600
) -> DataFrame:
    """Raster tier (r7): geometry rows → (url, png binary) — the SVG scene
    graph rendered through the in-house pixel kernels
    (kernels/geomraster.py), closing the analog-vs-artifact gap with the
    reference's matplotlib ``geo.jpg`` (run_dpsk_ocr_image.py:251-301;
    PNG not JPEG — lossless keeps the sink byte-deterministic, the same
    substitution contract as the SVG tier). Arrow-batched pandas UDF over
    the already-gated geometry rows: scene strings are tiny, rendering is
    pure numpy, identical bytes on every executor and task retry."""
    from deepseek_ocr_spark.kernels.geomraster import rasterize_geometry_svg

    @F.pandas_udf("binary")
    def _to_png(svgs: pd.Series) -> pd.Series:
        return svgs.map(
            lambda b: rasterize_geometry_svg(bytes(b).decode("utf-8"), size)
        )

    return geometry_figures(df, key_col, text_col).select(
        "url", _to_png(F.col("svg")).alias("png")
    )
