"""Data-mixing weights (textops.mixture_weights): exponential smoothing
semantics on a skewed corpus, hand-computed expectations, and the
alpha->1 identity."""

from deepseek_ocr_spark.operators.textops import mixture_weights


def _docs(spark, counts):
    rows = []
    i = 0
    for src, n in counts.items():
        for _ in range(n):
            rows.append((i, f"text {i}", src))
            i += 1
    return spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")


def test_rare_sources_upweighted(spark):
    docs = _docs(spark, {"big": 90, "small": 10})
    out = {r["source"]: r for r in mixture_weights(docs, alpha=0.3).collect()}
    # hand computation with the same micro-unit quantization
    qb = round(90 ** 0.3 * 1e6)
    qs = round(10 ** 0.3 * 1e6)
    assert out["big"]["share"] == 0.9 and out["small"]["share"] == 0.1
    assert out["big"]["weight"] == round(qb / (qb + qs), 4)
    assert out["small"]["weight"] == round(qs / (qb + qs), 4)
    # smoothing upweights the rare source, downweights the big one
    assert out["small"]["upsample"] > 1.0 > out["big"]["upsample"]
    # weights still sum to ~1
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-3


def test_alpha_one_is_identity(spark):
    docs = _docs(spark, {"a": 30, "b": 70})
    out = {r["source"]: r for r in mixture_weights(docs, alpha=1.0).collect()}
    for src in ("a", "b"):
        assert out[src]["weight"] == out[src]["share"]
        assert out[src]["upsample"] == 1.0
