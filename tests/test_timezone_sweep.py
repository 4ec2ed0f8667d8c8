"""Timezone sweep (was a manual round-2 verification, now durable): every
time-touching oracle pair must match DuckDB under a NON-UTC session zone
with a half-hour offset (Australia/Lord_Howe) — catches date_trunc /
unix-epoch / NTZ→LTZ traps the UTC-pinned replica gate can't see.
production sessions pin UTC (pipeline/session.py); this test asserts the
plans don't silently DEPEND on that pin."""

import pytest

import __spark_entry__ as entry_mod
from tests.test_entry_queries import SF_DIR, _value_hash, duck  # noqa: F401

TIME_QUERIES = [
    "events_hourly",
    "sessionize",
    "asof_join_orders",
    "interval_join_views_clicks",
    "props_json_rollup",
    "daily_active_users",
    "extract_summary",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", TIME_QUERIES)
def test_time_query_tz_independent(name, spark, duck):  # noqa: F811
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Lord_Howe")
    try:
        qdf = QUERIES[name](spark, SF_DIR)
        spark_rows = [tuple(r) for r in qdf.collect()]
        cols = qdf.columns
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    res = duck.sql(ORACLES[name])
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows), name
    assert _value_hash(spark_rows, cols) == _value_hash(duck_rows, res.columns), name
