"""Bigram-LM perplexity filter (corpus_stats.lm_bigram_score): semantic
ordering (formulaic text scores lower perplexity than corpus-unusual
text) and the excluded-rows contract; cross-engine parity is covered by
tests/test_entry_queries.py and the edge-corpus gate."""

from deepseek_ocr_spark.operators import corpus_stats

ROWS = [
    # formulaic docs: the same transitions repeated corpus-wide
    (0, "the cat sat on the mat", "en", "s", 22),
    (1, "the cat sat on the mat", "en", "s", 22),
    (2, "the cat sat on the mat again", "en", "s", 28),
    # corpus-unusual transitions
    (3, "zephyr quokka vortex manifold plinth", "en", "s", 36),
    (4, "x", "en", "s", 1),  # single token: no bigrams
    (5, None, "en", "s", 0),  # null text
]


def test_ordering_and_exclusions(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in corpus_stats.lm_bigram_score(docs).collect()}
    # no-bigram and null docs are excluded
    assert 4 not in out and 5 not in out
    # repeated formulaic docs get identical scores, lower than the
    # unusual-token doc (its bigrams occur once each over a larger V)
    assert out[0]["nll"] == out[1]["nll"]
    assert out[0]["ppl"] < out[3]["ppl"]
    assert out[0]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 4
    # ppl = exp(nll) up to the independent 4-decimal rounds
    import math

    for r in out.values():
        assert abs(r["ppl"] - math.exp(r["nll"])) < 1e-2 * r["ppl"]


def test_bpe_pairs_word_weighted(spark):
    """Pairs count once per WORD OCCURRENCE (weighted by word frequency),
    never per distinct word, and ranking is (cnt desc, a, b)."""
    rows = [
        (0, "abc abc ab", "en", "s", 10),
        (1, "abc xy", "en", "s", 6),
        (2, "z", "en", "s", 1),  # single char: no pairs
        (3, None, "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r["a"], r["b"]): (r["cnt"], r["rank"])
           for r in corpus_stats.bpe_top_pairs(docs).collect()}
    # "abc" occurs 3x -> (a,b) also in "ab" (1x) = 4; (b,c) = 3; (x,y) = 1
    assert out[("a", "b")] == (4, 1)
    assert out[("b", "c")] == (3, 2)
    assert out[("x", "y")][0] == 1
    assert ("z", "z") not in out


def test_no_python_in_plan(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    plan = (
        corpus_stats.lm_bigram_score(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan, bad


def test_lm_ppl_buckets_tertiles(spark):
    """Per-lang tertiles: heads have the lowest ppl, tails the highest;
    sizes split ceil(n/3)/third/rest; short docs (no LM score) excluded."""
    from deepseek_ocr_spark.operators.corpus_stats import lm_ppl_buckets

    rows = [
        # lang 'en': 6 scoreable docs + 1 too-short
        (0, "a a a a", "en"), (1, "a b a b", "en"), (2, "c d e f", "en"),
        (3, "a a b b", "en"), (4, "x y z w", "en"), (5, "a b c d", "en"),
        (6, "solo", "en"),
        # lang 'fr': 2 docs
        (7, "m m m", "fr"), (8, "m n o", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING, lang STRING")
    out = {r["doc_id"]: r for r in lm_ppl_buckets(docs).collect()}
    assert 6 not in out  # single-token doc has no bigrams
    en = [r for r in out.values() if r["lang"] == "en"]
    assert len(en) == 6
    # expected buckets from the scores themselves: thresholds are the ppl
    # at ranks ceil(n/3) and ceil(2n/3); assignment is THRESHOLD-based
    # (CCNet), so docs tied at a cut share its bucket
    ppls = sorted(r["ppl"] for r in en)
    t33, t67 = ppls[(len(ppls) + 2) // 3 - 1], ppls[(2 * len(ppls) + 2) // 3 - 1]
    for r in en:
        expect = "head" if r["ppl"] <= t33 else ("middle" if r["ppl"] <= t67 else "tail")
        assert r["bucket"] == expect, (r, t33, t67)
    by_bucket = {}
    for r in en:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert max(by_bucket["head"]) <= min(by_bucket.get("middle", by_bucket["head"]))
    fr = [r for r in out.values() if r["lang"] == "fr"]
    assert sorted(r["bucket"] for r in fr) == ["head", "middle"]
