"""Directory-of-files source (O-1 analog) + Iceberg gating."""

import pytest

from deepseek_ocr_spark.datagen.synth import gen_documents
from deepseek_ocr_spark.oracle.runner import run_oracle
from deepseek_ocr_spark.pipeline.extract_job import extract_documents
from deepseek_ocr_spark.sources.catalog import load_documents_dir, load_documents_iceberg


def test_binaryfile_dir_source_end_to_end(spark, tmp_path):
    rows = gen_documents(12)
    for i, r in enumerate(rows):
        (tmp_path / f"doc{i}.html").write_bytes(r["html"])
    (tmp_path / "ignore.txt").write_text("not html")

    docs = load_documents_dir(spark, str(tmp_path))
    assert docs.count() == 12  # glob filter excluded the .txt
    got = {r["url"].rsplit("/", 1)[-1]: r for r in extract_documents(docs).collect()}
    oracle = {f"doc{i}.html": o for i, o in enumerate(run_oracle(rows))}
    for k, o in oracle.items():
        assert got[k]["text"] == o["text"], k


def test_iceberg_gated_error(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime not available"):
        load_documents_iceberg(spark, "catalog.db.documents")
