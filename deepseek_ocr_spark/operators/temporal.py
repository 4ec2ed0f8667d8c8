"""Temporal operator family over the events/orders tables.

Two operators Spark lacks as built-ins, both expressed as compositions of
existing DataFrame ops (no UDFs, no per-row Python):

- ``sessionize``: gap-based sessionization (the canonical clickstream op) —
  lag + running-sum windows, one shuffle on user_id.
- ``asof_join``: each event matched to the most recent order at-or-before
  its timestamp. Implemented with the union-and-window technique: tag both
  streams, sort once per key by (time, tag), take ``last(..., ignorenulls)``
  over the unbounded-preceding frame. ONE shuffle of the combined stream
  (key, time, few cols) — plus a pre-reduce shuffle of the (smaller) order
  side for tie dedup — no range-join explosion, no per-key collect; this is
  the 100 TB shape (a naive t1 <= t2 range join is quadratic in hot keys).
  DuckDB's native ASOF JOIN is the oracle.

Determinism note: among several orders with the SAME (custkey, orderdate),
"the most recent order" is ambiguous and engines disagree — both sides
pre-reduce to the max orderkey per (custkey, orderdate) so the match is
well-defined before the as-of logic runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def _epoch_us(c: F.Column) -> F.Column:
    """TIMESTAMP_NTZ → exact epoch MICROSECONDS, SESSION-TZ-INDEPENDENT.

    Two parity traps avoided (both verified by running under a non-UTC
    session vs DuckDB epoch_us):
    - seconds granularity: Spark's cast-to-long floors while DuckDB's
      CAST(epoch()) rounds, so borderline gaps split sessions differently
      → stay in exact integer microseconds;
    - ``unix_micros(c.cast('timestamp_ltz'))`` interprets the naive value
      in the SESSION timezone — correct only when the caller pinned UTC.
      Interval-since-epoch + fractional-second extract never consults the
      session zone. (Domain: post-1970 timestamps.)"""
    iv_sec = (c - F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))).cast("long")
    frac_us = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long") % 1_000_000
    return iv_sec * 1_000_000 + frac_us


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """events → per-session rollup (user_id, session_no, session_start,
    session_end, n_events, duration_us). A session breaks when the gap to
    the previous event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(_epoch_us(F.col("ts")), 1).over(w)
    is_new = (
        prev.isNull()
        | ((_epoch_us(F.col("ts")) - prev) > gap_minutes * 60 * 1_000_000)
    ).cast("int")
    sess = events.withColumn("_new", is_new).withColumn(
        "session_no", F.sum("_new").over(w)
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_epoch_us(F.col("ts"))) - F.min(_epoch_us(F.col("ts"))))
        .cast("bigint")
        .alias("duration_us"),
    )


def sessionize_sql(gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    return f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_minutes * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS session_no
  FROM e
)
SELECT user_id, session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, session_no
"""


def asof_join(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Each event → the most recent order (by o_orderdate <= ts) of the same
    user. Returns (event_id, user_id, ts, o_orderkey, o_orderdate); events
    with no prior order are dropped (inner as-of)."""
    # well-defined match under date ties: max orderkey per (custkey, date)
    ords = orders.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t")
    ).agg(F.max("o_orderkey").alias("o_orderkey"))
    tagged_orders = ords.select(
        "user_id", "t", F.lit(0).alias("_src"),
        F.lit(None).cast("long").alias("event_id"), "o_orderkey",
    )
    tagged_events = events.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("_src"),
        "event_id", F.lit(None).cast("long").alias("o_orderkey"),
    )
    both = tagged_orders.unionByName(tagged_events)
    # orders sort BEFORE events at equal t (_src 0 < 1) → ts >= o_orderdate
    # is inclusive, matching ASOF JOIN's >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        "m_orderkey", F.last(F.when(F.col("_src") == 0, F.col("o_orderkey")), ignorenulls=True).over(w)
    ).withColumn(
        "m_orderdate", F.last(F.when(F.col("_src") == 0, F.col("t")), ignorenulls=True).over(w)
    )
    return (
        matched.filter((F.col("_src") == 1) & F.col("m_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("ts"),
            F.col("m_orderkey").alias("o_orderkey"),
            F.col("m_orderdate").alias("o_orderdate"),
        )
    )


ASOF_JOIN_SQL = """
WITH ords AS (
  SELECT o_custkey AS user_id, o_orderdate AS t, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.t AS o_orderdate
FROM events e
ASOF JOIN ords o ON e.user_id = o.user_id AND e.ts >= o.t
"""


def daily_active_users(events: DataFrame) -> DataFrame:
    """Per-day distinct-user + event counts — the distinct-aggregate plan
    shape (Expand + two-phase agg): partial distinct happens map-side per
    (day, user), so the exchange carries at most |days|×|users| rows no
    matter how many events there are.

    cast-to-date (tz-free on NTZ), not date_trunc — see events_hourly."""
    day = F.col("ts").cast("date").cast("timestamp_ntz").alias("day")
    return events.groupBy(day).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


DAILY_ACTIVE_USERS_SQL = """
-- CAST: DuckDB date_trunc('day') yields DATE while Spark yields timestamp
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def props_json_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` column
    (schema-on-read) and aggregate the extracted field per event_type.
    ``from_json`` with an explicit schema stays in codegen and NULLs out
    malformed documents instead of failing the task — the right contract
    for a web-scale JSON column."""
    k = F.from_json(F.col("props"), "k INT")["k"]
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(k, F.lit(0)).cast("bigint")).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


PROPS_JSON_ROLLUP_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(coalesce(CAST(json_extract(props, '$.k') AS INT), 0)) AS BIGINT) AS sum_k,
       count(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k
FROM events GROUP BY event_type
"""


def interval_join_views_clicks(events: DataFrame, within_minutes: int = 30) -> DataFrame:
    """Batch interval join (the streaming variant lives in
    streaming/windowed.stream_stream_view_click_join): clicks matched to
    same-user views within the preceding window. Equi-key (user) + time
    band — Spark executes as a sort-merge join on user with the band as a
    post-join filter; hot users are the skew risk (AQE skew split covers
    the SMJ case)."""
    from deepseek_ocr_spark.streaming.windowed import stream_stream_view_click_join

    return stream_stream_view_click_join(
        events, events, within_minutes=within_minutes, watermark="100 days"
    )


def interval_join_views_clicks_sql(within_minutes: int = 30) -> str:
    return f"""
SELECT c.user_id, v.event_id AS view_id, c.event_id AS click_id,
       v.ts AS v_ts, c.ts AS c_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND v.ts <= c.ts
 AND v.ts >= c.ts - INTERVAL {within_minutes} MINUTES
"""


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """(user_id, ts, event_id, event_type, value) — the newest event per
    user (tiebreak: highest event_id), i.e. the snapshot/revision-dedup
    shape: keep the latest crawl of each url, the last state of each key.

    Plan shape: ``max(struct(ts, event_id, ...))`` — ONE map-side-
    combinable aggregation, deliberately NOT a row_number window: a hot
    key (one user with 10^9 events / one url recrawled daily for years)
    reduces to a single row per task before the shuffle, while a window
    would sort all of its rows inside one partition (the
    dedup_lines_global rule).  The DuckDB oracle keeps the row_number
    formulation — two independent derivations; its ORDER BY extends past
    (ts, event_id) into event_type/value so both engines share the SAME
    total order even if (user_id, ts, event_id) is ever non-unique."""
    return (
        events.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("event_type"),
                    F.col("value").alias("value"),
                )
            ).alias("_m")
        )
        .select(
            "user_id",
            F.col("_m.ts").alias("ts"),
            F.col("_m.event_id").alias("event_id"),
            F.col("_m.event_type").alias("event_type"),
            F.col("_m.value").alias("value"),
        )
    )


def latest_event_per_user_sql(table: str = "events") -> str:
    return f"""
SELECT user_id, ts, event_id, event_type, value
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC,
                                     event_type DESC, value DESC) AS rn
  FROM {table}
)
WHERE rn = 1
"""
