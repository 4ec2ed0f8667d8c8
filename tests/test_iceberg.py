"""Iceberg lane — runs end-to-end when iceberg-spark-runtime is on the
classpath (a jar-present CI image / real cluster) and self-skips in the
jar-less sandbox, so the gate in sources/catalog.py is exercised code on
every environment that CAN exercise it. Manual recipe: docs/ICEBERG.md."""

import pytest

from deepseek_ocr_spark.sources.catalog import (
    configure_local_iceberg_catalog,
    iceberg_available,
    load_documents_iceberg,
    write_documents_iceberg,
)


def _docs(spark, n, offset=0):
    from deepseek_ocr_spark.datagen.synth import gen_documents

    return spark.createDataFrame(
        [
            {**r, "url": f"doc://{offset}/{i}"}
            for i, r in enumerate(gen_documents(n))
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_iceberg_write_read_snapshot(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath (sandbox); "
                    "the jar-present CI lane runs this test")
    configure_local_iceberg_catalog(spark, "ice_test", str(tmp_path))
    table = "ice_test.db.documents"

    write_documents_iceberg(_docs(spark, 20), table)
    df = load_documents_iceberg(spark, table)
    assert df.count() == 20
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]

    first_snapshot = (
        spark.sql(f"SELECT snapshot_id FROM {table}.snapshots "
                  "ORDER BY committed_at").head()["snapshot_id"]
    )
    _docs(spark, 5, offset=1).writeTo(table).append()
    assert load_documents_iceberg(spark, table).count() == 25
    # time travel: a pinned snapshot read must replay the pre-append state
    pinned = load_documents_iceberg(spark, table, snapshot_id=int(first_snapshot))
    assert pinned.count() == 20


def test_iceberg_gate_raises_clearly_without_jars(spark):
    if iceberg_available(spark):
        pytest.skip("jars present — the gate path is for jar-less environments")
    with pytest.raises(RuntimeError, match="Iceberg runtime not available"):
        load_documents_iceberg(spark, "nosuch.db.t")
    with pytest.raises(RuntimeError, match="Iceberg runtime not available"):
        write_documents_iceberg(_docs(spark, 1), "nosuch.db.t")
