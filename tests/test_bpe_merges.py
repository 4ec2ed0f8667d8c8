"""Multi-iteration BPE (corpus_stats.bpe_merges): merge-loop semantics on
hand-built corpora — greedy left-to-right application, later merges built
on earlier merged symbols, deterministic tie-breaks, and loop termination
when no pairs remain."""

from deepseek_ocr_spark.operators import corpus_stats as CS


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )


def test_merges_build_on_merged_symbols(spark):
    # 'abab' x3: merge1 = (a,b) cnt 6; then words are [ab, ab] — merge2
    # must be the MERGED pair (ab, ab), not any single-char pair
    docs = _docs(spark, ["abab abab abab"])
    got = [(r["step"], r["a"], r["b"], r["cnt"])
           for r in CS.bpe_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "b", 6), (2, "ab", "ab", 3)]


def test_greedy_left_to_right_overlap(spark):
    # 'aaa': pairs (a,a) twice -> cnt 2; application is greedy
    # left-to-right: aaa -> [aa, a] (NOT [a, aa]); next round's top pair
    # is therefore (aa, a)
    docs = _docs(spark, ["aaa"])
    got = [(r["step"], r["a"], r["b"], r["cnt"])
           for r in CS.bpe_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", 2), (2, "aa", "a", 1)]


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' both appear twice -> tie on cnt; (a,b) < (x,y)
    docs = _docs(spark, ["xy ab", "ab xy"])
    got = CS.bpe_merges(docs, n_merges=1).collect()[0]
    assert (got["a"], got["b"], got["cnt"]) == ("a", "b", 2)


def test_loop_stops_when_no_pairs_left(spark):
    # single-char words only: zero adjacent pairs -> empty merge table
    docs = _docs(spark, ["a b c", "a b"])
    assert CS.bpe_merges(docs, n_merges=3).collect() == []
    # 'ab' exhausts after one merge; steps 2..3 produce nothing
    docs2 = _docs(spark, ["ab ab"])
    got = [(r["step"], r["a"], r["b"]) for r in CS.bpe_merges(docs2, n_merges=3).collect()]
    assert got == [(1, "a", "b")]


def test_word_frequency_weighting(spark):
    # 'zz' appears 3 times as a word; 'qr' 2 times — counts are
    # corpus-weighted, not distinct-word counts
    docs = _docs(spark, ["zz zz qr", "zz qr"])
    got = CS.bpe_merges(docs, n_merges=1).collect()[0]
    assert (got["a"], got["b"], got["cnt"]) == ("z", "z", 3)
