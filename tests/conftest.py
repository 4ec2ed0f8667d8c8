import pytest


@pytest.fixture(scope="session")
def spark():
    from deepseek_ocr_spark.pipeline.session import build_session

    s = build_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_df(spark):
    """Synthetic documents corpus as a Spark DataFrame (FIXTURES.md §1)."""
    from deepseek_ocr_spark.datagen.synth import gen_documents

    rows = gen_documents(60)
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).cache()
