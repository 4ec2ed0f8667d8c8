"""Mode-matrix coverage: the three post-process cascades (eval/pdf/image,
SURVEY.md O-36) and the resolution modes (Tiny…Gundam, reference config.py:2-6)
must all be byte-identical between the Spark plan and the oracle."""

import pytest

from deepseek_ocr_spark.config import MODES, EngineConfig
from deepseek_ocr_spark.datagen.synth import gen_documents
from deepseek_ocr_spark.kernels.tokens import num_vision_tokens
from deepseek_ocr_spark.oracle.runner import run_oracle
from deepseek_ocr_spark.pipeline.extract_job import extract_documents


@pytest.mark.parametrize("mode", ["eval", "pdf", "image"])
def test_cascade_mode_byte_identity(spark, docs_df, mode):
    cfg = EngineConfig(mode=mode)
    rows = gen_documents(60)
    oracle = {r["url"]: r for r in run_oracle(rows, cfg)}
    got = {r["url"]: r for r in extract_documents(docs_df, cfg).collect()}
    assert set(got) == set(oracle)
    for u in oracle:
        assert got[u]["text"] == oracle[u]["text"], (mode, u)
        assert got[u]["raw_text"] == oracle[u]["raw_text"], (mode, u)


def test_cascade_modes_differ():
    """Sanity: the three cascades actually produce different bytes on a
    corpus containing image spans / newline runs / latex colon-eq forms."""
    rows = gen_documents(60)
    texts = {}
    for mode in ("eval", "pdf", "image"):
        out = run_oracle(rows, EngineConfig(mode=mode))
        texts[mode] = "".join(r["text"] for r in out)
    assert texts["eval"] != texts["pdf"]
    assert texts["pdf"] != texts["image"]


@pytest.mark.parametrize("name", sorted(MODES))
def test_resolution_modes_token_budget(spark, docs_df, name):
    base, img, crop = MODES[name]
    cfg = EngineConfig(base_size=base, image_size=img, crop_mode=crop)
    rows = gen_documents(30)
    oracle = {r["url"]: r for r in run_oracle(rows, cfg)}
    got = {
        r["url"]: r
        for r in extract_documents(spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ), cfg).collect()
    }
    for u in oracle:
        assert got[u]["n_vision_tokens"] == oracle[u]["n_vision_tokens"], (name, u)
    if not crop:
        # crop_mode off → every page costs exactly the mode's base budget
        per_page = num_vision_tokens(1, 1, base, img)
        for u, r in oracle.items():
            assert r["n_vision_tokens"] == r["n_pages"] * per_page
