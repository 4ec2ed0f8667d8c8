"""Relational tile planner — SURVEY.md O-10/O-11/O-23/O-13/O-18.

Re-expresses the reference's argmin scan (vllm/process/image_process.py:11-42)
as a broadcast cross join against the 13-row candidate table plus a window
top-1 — the Spark-first formulation of "find the closest aspect ratio".

Scan→window translation (verified against the kernel by property test):
the reference iterates candidates in ascending-area order keeping the first
min-diff candidate, except a later equal-diff candidate replaces it iff
``width*height > 0.5 * image_size^2 * i * j``. Equivalently, within the
min-diff group: the LAST candidate satisfying the area condition wins, else
the FIRST. As an ORDER BY:

    diff ASC,
    area_cond DESC,
    CASE WHEN area_cond THEN -pos ELSE pos END ASC

where ``pos`` is the candidate's scan position. Broadcast join: the candidate
side is 13 rows — never a shuffle of the page side for the join itself; the
window partitions by the page key (one shuffle, unavoidable for ranking,
and AQE-coalesced).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_spark.config import BASE_SIZE, IMAGE_SIZE, MAX_CROPS, MIN_CROPS
from deepseek_ocr_spark.kernels.tiling import candidate_ratios
from deepseek_ocr_spark.kernels.tokens import grid_side


def candidates_df(spark: SparkSession, min_crops: int = MIN_CROPS,
                  max_crops: int = MAX_CROPS) -> DataFrame:
    """The literal candidate dimension table (image_process.py:32-36)."""
    rows = [
        (pos, i, j) for pos, (i, j) in enumerate(candidate_ratios(min_crops, max_crops))
    ]
    return spark.createDataFrame(rows, "pos INT, i INT, j INT")


def candidates_sql_values(min_crops: int = MIN_CROPS, max_crops: int = MAX_CROPS) -> str:
    """Same table as a SQL VALUES literal for the DuckDB oracle."""
    rows = ", ".join(
        f"({pos}, {i}, {j})"
        for pos, (i, j) in enumerate(candidate_ratios(min_crops, max_crops))
    )
    return f"(VALUES {rows}) AS c(pos, i, j)"


def with_tile_plan(
    pages: DataFrame,
    key_cols: list[str],
    width_col: str = "width",
    height_col: str = "height",
    image_size: int = IMAGE_SIZE,
    crop_mode: bool = True,
) -> DataFrame:
    """pages(+key, width, height) → + (nw, nh) via broadcast argmin join.

    Argmin as a lexicographic ``min(struct(...))`` AGGREGATION, not a window
    top-1: the struct key (diff, area_rank, pos_key) encodes exactly the
    scan→ORDER BY translation in the module docstring (area_rank 0 when the
    area condition holds — DESC becomes ASC on the rank; pos_key flips sign
    inside the area group). A hash aggregate combines map-side, so the 13×
    candidate inflation collapses back to ONE row per page BEFORE the
    exchange, and no per-partition sort happens at all — vs the window
    formulation which shuffles all 13 rows per page and sorts them.
    (The DuckDB oracle keeps the window formulation on purpose: two
    independent derivations of the same argmin cross-check each other.)

    The small-page bypass (image_process.py:363-375) and crop_mode=False
    short-circuit to (1,1) via CASE. Non-key page columns ride inside the
    min-struct (every candidate of a page carries identical copies).
    """
    spark = pages.sparkSession
    cand = F.broadcast(candidates_df(spark))
    w, h = F.col(width_col), F.col(height_col)
    passthrough = [c for c in pages.columns if c not in key_cols]

    area_cond = w * h > F.lit(0.5 * image_size * image_size) * F.col("i") * F.col("j")
    scored = pages.crossJoin(cand).select(
        *key_cols,
        F.struct(
            F.abs(w / h - F.col("i") / F.col("j")).alias("diff"),
            F.when(area_cond, 0).otherwise(1).alias("area_rank"),
            F.when(area_cond, -F.col("pos")).otherwise(F.col("pos")).alias("pos_key"),
            F.col("i").alias("i"),
            F.col("j").alias("j"),
            *[F.col(c).alias(c) for c in passthrough],
        ).alias("cand"),
    )
    best = scored.groupBy(*key_cols).agg(F.min("cand").alias("b"))

    bw, bh = F.col(f"b.{width_col}"), F.col(f"b.{height_col}")
    bypass = (bw <= image_size) & (bh <= image_size) if crop_mode else F.lit(True)
    return best.select(
        *key_cols,
        *[F.col(f"b.{c}").alias(c) for c in passthrough],
        F.when(bypass, F.lit(1)).otherwise(F.col("b.i")).alias("nw"),
        F.when(bypass, F.lit(1)).otherwise(F.col("b.j")).alias("nh"),
    )


def vision_tokens_col(
    nw: Column, nh: Column, base_size: int = BASE_SIZE, image_size: int = IMAGE_SIZE
) -> Column:
    """O-13 as a pure column expression (vllm/deepseek_ocr.py:95-106)."""
    hg = grid_side(base_size)
    h2 = grid_side(image_size)
    global_tokens = F.lit(hg * (hg + 1))
    local_tokens = F.when(
        (nw > 1) | (nh > 1), (nh * F.lit(h2)) * (nw * F.lit(h2) + 1)
    ).otherwise(F.lit(0))
    return (global_tokens + local_tokens + 1).cast("bigint")


def tile_plan_sql(
    pages_sql: str,
    key_cols: list[str],
    width_expr: str = "width",
    height_expr: str = "height",
    image_size: int = IMAGE_SIZE,
) -> str:
    """DuckDB-oracle SQL mirroring ``with_tile_plan`` over ``pages_sql``
    (a subquery producing key + width + height columns)."""
    keys = ", ".join(key_cols)
    return f"""
WITH pages AS ({pages_sql}),
scored AS (
  SELECT p.*, c.pos, c.i, c.j,
         abs(CAST({width_expr} AS DOUBLE)/{height_expr} - CAST(c.i AS DOUBLE)/c.j) AS diff,
         ({width_expr} * {height_expr} > 0.5 * {image_size} * {image_size} * c.i * c.j) AS area_cond
  FROM pages p CROSS JOIN {candidates_sql_values()}
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY {keys}
      ORDER BY diff ASC, area_cond DESC,
               CASE WHEN area_cond THEN -pos ELSE pos END ASC) AS rn
  FROM scored
)
SELECT {keys}, {width_expr} AS width, {height_expr} AS height,
       CASE WHEN {width_expr} <= {image_size} AND {height_expr} <= {image_size}
            THEN 1 ELSE i END AS nw,
       CASE WHEN {width_expr} <= {image_size} AND {height_expr} <= {image_size}
            THEN 1 ELSE j END AS nh
FROM ranked WHERE rn = 1
"""
