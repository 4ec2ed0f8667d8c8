"""O-7: annotated-layout sink (debug tier).

The reference draws every parsed span's box onto the page image and emits a
``_layouts.pdf`` per run (run_dpsk_ocr_pdf.py:151-215: rescale 0-999 coords
to pixels, outline width 4 for ``title`` / 2 otherwise, translucent fill,
label text at (x1, max(0, y1-15))). The sandbox has no raster codecs, so the
sink substitutes SVG — a pure-text vector format with identical semantics —
emitted as a binary column keyed (url, page_no).

Substitution (documented): the reference colors boxes with ``np.random``;
a debug artifact must be deterministic in a distributed engine (re-run ==
same bytes, task retry == same bytes), so colors come from a fixed palette
indexed by span ordinal.

Built entirely from Catalyst string expressions (format_string / collect /
concat) — no Python on the data path; one (url) shuffle to group spans, one
broadcast-or-shuffle join back to page dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic stand-in for the reference's np.random.randint color triple
PALETTE = [
    "#1f77b4", "#d62728", "#2ca02c", "#9467bd",
    "#ff7f0e", "#8c564b", "#17becf", "#7f7f7f",
]

SVG_HEADER = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 %d %d" '
    'width="%d" height="%d">'
)
RECT_FMT = (
    '<rect x="%d" y="%d" width="%d" height="%d" stroke="%s" '
    'stroke-width="%d" fill="%s" fill-opacity="0.08"/>'
    '<text x="%d" y="%d" fill="%s" font-size="12">%s</text>'
)


def span_svg_elem() -> F.Column:
    """One span struct ``s`` → its SVG rect+label fragment."""
    s = F.col("s")
    color = F.element_at(
        F.array(*[F.lit(c) for c in PALETTE]), F.pmod(s["ord"], F.lit(len(PALETTE))) + 1
    )
    stroke_w = F.when(s["label"] == "title", F.lit(4)).otherwise(F.lit(2))
    text_y = F.greatest(F.lit(0), s["py1"] - 15)
    return F.format_string(
        RECT_FMT,
        s["px1"], s["py1"],
        s["px2"] - s["px1"], s["py2"] - s["py1"],
        color, stroke_w, color,
        s["px1"], text_y, color, s["label"],
    )


def _page_bodies(extracted: DataFrame) -> DataFrame:
    """(url, page_no, width, height, body, n_boxes) — each page's SVG inner
    elements (ord-sorted rect+label fragments; empty string for zero-span
    pages). Shared by the per-page sink and the per-doc assembly."""
    pages = extracted.select("url", F.explode("page_dims").alias("pd")).select(
        "url",
        F.col("pd.page_no").alias("page_no"),
        F.col("pd.width").alias("width"),
        F.col("pd.height").alias("height"),
    )
    elems = (
        extracted.select("url", F.explode("spans").alias("s"))
        .select(
            "url",
            F.col("s.page_no").alias("page_no"),
            F.struct(F.col("s.ord").alias("ord"), span_svg_elem().alias("e")).alias("oe"),
        )
        .groupBy("url", "page_no")
        .agg(
            F.array_sort(F.collect_list("oe")).alias("oes"),
            F.count(F.lit(1)).cast("int").alias("n_boxes"),
        )
    )
    body = F.concat_ws(
        "", F.coalesce(F.transform("oes", lambda x: x["e"]), F.array())
    )
    return pages.join(elems, ["url", "page_no"], "left").select(
        "url",
        "page_no",
        "width",
        "height",
        body.alias("body"),
        F.coalesce("n_boxes", F.lit(0)).alias("n_boxes"),
    )


def layouts_table(extracted: DataFrame) -> DataFrame:
    """extracted → layouts(url, page_no, svg binary, n_boxes).

    Pages with zero spans still get a (valid, empty) canvas — the reference
    emits every page into _layouts.pdf whether or not boxes were parsed.

    Caveat (debug tier): spans are keyed by page_no only, so a document with
    DUPLICATE page_no values gets each duplicate's canvas annotated with the
    merged span set of that page_no (the extraction text path handles
    duplicates exactly via the seq tiebreak; the layout sink does not try)."""
    pb = _page_bodies(extracted)
    svg = F.concat(
        F.format_string(SVG_HEADER, F.col("width"), F.col("height"),
                        F.col("width"), F.col("height")),
        F.col("body"),
        F.lit("</svg>"),
    )
    return pb.select(
        "url",
        "page_no",
        F.encode(svg, "UTF-8").alias("svg"),
        "n_boxes",
    )


# one assembled page inside the per-doc artifact: a nested <svg> viewport at
# the page's cumulative y offset (the SVG analog of one img2pdf page)
PAGE_FMT = '<svg x="0" y="%d" width="%d" height="%d" viewBox="0 0 %d %d">%s</svg>'


def layouts_doc(extracted: DataFrame) -> DataFrame:
    """Per-DOC assembled layout artifact (url, svg binary, n_pages,
    n_boxes): every page's annotated canvas stacked vertically in page
    order inside one SVG — the analog of the reference's single
    ``_layouts.pdf`` assembled from per-page images via img2pdf
    (run_dpsk_ocr_pdf.py:97-119), keyed per url (one artifact per document,
    the per-url unit every other sink uses).

    Canvas = (max page width) × (sum of page heights); offsets are an
    ordered fold over the page array (pure Catalyst — one url shuffle, no
    Python). Duplicate page_no pages sort deterministically by
    (page_no, width, height, body)."""
    pb = _page_bodies(extracted)
    pages = pb.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("page_no", "width", "height", "body"))
        ).alias("ps"),
        F.sum("n_boxes").cast("int").alias("n_boxes"),
    )
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("y"), F.lit("").alias("s")
    )
    folded = F.aggregate(
        "ps",
        acc0,
        lambda acc, p: F.struct(
            (acc["y"] + p["height"]).cast("bigint").alias("y"),
            F.concat(
                acc["s"],
                F.format_string(
                    PAGE_FMT,
                    acc["y"], p["width"], p["height"],
                    p["width"], p["height"], p["body"],
                ),
            ).alias("s"),
        ),
    )
    max_w = F.array_max(F.transform("ps", lambda p: p["width"]))
    svg = F.concat(
        F.format_string(SVG_HEADER, max_w, folded["y"], max_w, folded["y"]),
        folded["s"],
        F.lit("</svg>"),
    )
    return pages.select(
        "url",
        F.encode(svg, "UTF-8").alias("svg"),
        F.size("ps").alias("n_pages"),
        "n_boxes",
    )
