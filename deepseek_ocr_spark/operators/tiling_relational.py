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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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

    The small-page bypass (image_process.py:363-375) and crop_mode=False
    short-circuit to (1,1) via CASE — Catalyst prunes nothing here since the
    join is computed for all rows, but the join side is a broadcast of 13
    rows, so the only cost is the rank window.
    """
    spark = pages.sparkSession
    cand = F.broadcast(candidates_df(spark))
    w, h = F.col(width_col), F.col(height_col)

    scored = pages.crossJoin(cand).select(
        *pages.columns,
        "pos",
        "i",
        "j",
        F.abs(w / h - F.col("i") / F.col("j")).alias("diff"),
        (w * h > F.lit(0.5 * image_size * image_size) * F.col("i") * F.col("j")).alias(
            "area_cond"
        ),
    )
    order = [
        F.col("diff").asc(),
        F.col("area_cond").desc(),
        F.when(F.col("area_cond"), -F.col("pos")).otherwise(F.col("pos")).asc(),
    ]
    win = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    ranked = scored.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)

    bypass = (w <= image_size) & (h <= image_size) if crop_mode else F.lit(True)
    return ranked.select(
        *pages.columns,
        F.when(bypass, F.lit(1)).otherwise(F.col("i")).alias("nw"),
        F.when(bypass, F.lit(1)).otherwise(F.col("j")).alias("nh"),
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
