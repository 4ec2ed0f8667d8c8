"""Tile planner — dynamic "Gundam" tiling plan for a page.

Reproduces the selection semantics of the reference's
``find_closest_aspect_ratio`` / ``count_tiles``
(vllm/process/image_process.py:11-42) and the small-page bypass
(vllm/process/image_process.py:363-375, vllm/deepseek_ocr.py:78-93):

- candidate grid set ``{(i, j) : min_crops <= i*j <= max_crops}``,
  iterated in ascending-area order (ties in area keep Python ``sorted``
  stability over the de-duplicated set — we materialize the same ordering);
- argmin of ``|aspect - i/j|`` with the reference's tiebreak: on an exact
  diff tie, the later candidate wins iff
  ``width*height > 0.5 * image_size^2 * i * j``;
- pages with ``w <= image_size and h <= image_size`` (or crop_mode off)
  bypass tiling entirely → (1, 1).

This module is pure Python (no Spark) so the oracle and the pandas UDFs
share it verbatim. The relational re-expression of the same argmin (cross
join against the candidate table + window top-1) lives in
``operators/tiling_relational.py``; both are tested for agreement.
"""

from __future__ import annotations

from functools import lru_cache

from deepseek_ocr_spark.config import IMAGE_SIZE, MAX_CROPS, MIN_CROPS


@lru_cache(maxsize=8)
def candidate_ratios(min_crops: int = MIN_CROPS, max_crops: int = MAX_CROPS) -> tuple[tuple[int, int], ...]:
    """The (nw, nh) candidate set, sorted by area — reference image_process.py:32-36.

    The reference builds a ``set`` then ``sorted(key=lambda x: x[0]*x[1])``.
    CPython's set iteration order for small int tuples is insertion-order-
    dependent but ``sorted`` is stable, so equal-area candidates keep set
    order — which for these small tuples is deterministic per interpreter.
    To be interpreter-independent we sort by (area, i, j). NOTE: this
    equivalence is EMPIRICAL for the default (2,6) candidate set — in
    general the scan winner among equal-area equal-diff candidates does
    depend on their relative order (last wins when the area check passes,
    first wins when it fails). A dense grid probe over integer dims found
    no divergence for this candidate set (tests/test_tiling.py exercises
    the fuzz surface); a different (min,max) crop range would need its own
    probe before trusting the (area, i, j) order.
    """
    cands = {
        (i, j)
        for n in range(min_crops, max_crops + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if min_crops <= i * j <= max_crops
    }
    return tuple(sorted(cands, key=lambda x: (x[0] * x[1], x[0], x[1])))


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: tuple[tuple[int, int], ...],
    width: int,
    height: int,
    image_size: int,
) -> tuple[int, int]:
    """Argmin scan with area tiebreak — reference image_process.py:11-25."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for i, j in target_ratios:
        diff = abs(aspect_ratio - i / j)
        if diff < best_diff:
            best_diff = diff
            best = (i, j)
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * i * j:
                best = (i, j)
    return best


def count_tiles(
    width: int,
    height: int,
    min_crops: int = MIN_CROPS,
    max_crops: int = MAX_CROPS,
    image_size: int = IMAGE_SIZE,
) -> tuple[int, int]:
    """(nw, nh) tile grid for a page — reference image_process.py:28-42."""
    ratios = candidate_ratios(min_crops, max_crops)
    return find_closest_aspect_ratio(width / height, ratios, width, height, image_size)


def tile_plan(
    width: int,
    height: int,
    crop_mode: bool = True,
    image_size: int = IMAGE_SIZE,
    min_crops: int = MIN_CROPS,
    max_crops: int = MAX_CROPS,
) -> tuple[int, int]:
    """Full plan incl. small-page bypass — reference image_process.py:363-375.

    ``w <= image_size and h <= image_size`` → (1, 1); crop_mode=False → (1, 1).
    """
    if not crop_mode:
        return (1, 1)
    if width <= image_size and height <= image_size:
        return (1, 1)
    return count_tiles(width, height, min_crops, max_crops, image_size)


def tile_boxes(nw: int, nh: int, image_size: int = IMAGE_SIZE) -> list[tuple[int, int, int, int]]:
    """Row-major non-overlapping tile crop boxes on the resized page —
    reference ``dynamic_preprocess`` image_process.py:66-78."""
    boxes = []
    for k in range(nw * nh):
        boxes.append(
            (
                (k % nw) * image_size,
                (k // nw) * image_size,
                (k % nw + 1) * image_size,
                (k // nw + 1) * image_size,
            )
        )
    return boxes
