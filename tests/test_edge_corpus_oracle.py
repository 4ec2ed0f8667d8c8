"""Edge-corpus oracle gate: the dedup/sketch/index registry queries must
match DuckDB on a hand-built ADVERSARIAL documents table (null text, empty
text, single token, exact duplicates, unicode, whitespace runs) — the
driver's generated tables are clean, so row-set parity on nulls/empties is
otherwise untested (the r2 simhash null-row divergence is exactly the bug
class this catches)."""

import pytest

import __spark_entry__ as entry_mod
from tests.test_entry_queries import _value_hash

EDGE_ROWS = [
    (1, "", "en", "src0", 0),
    (2, None, "en", "src0", 0),
    (3, "a", "de", "src1", 1),
    (4, "the same text exactly here", "en", "src0", 26),
    (5, "the same text exactly here", "en", "src1", 26),
    (6, "unicode ünïcødé 你好 mixed text", "fr", "src2", 30),
    (7, "a b a b a b a b", "en", "src0", 15),
    (8, "tab\tseparated  and  doubled  spaces", "de", "src1", 35),
    (9, "one two three four five six seven", "en", "src2", 33),
    (10, "one two three four five six seven", "en", "src2", 33),
    # NULL measure: Spark sorts NULLS FIRST asc, DuckDB NULLS LAST — the
    # rank-based quantile/median queries must exclude it on both sides
    (11, "null metric text", "en", "src1", None),
    # NULL group key: a Spark join on lang is null-rejecting while SQL
    # GROUP BY keeps a NULL group — by-lang queries must pick one rule
    (12, "null lang but countable text", None, "src0", 28),
    # PII-bearing row (r5): exercises the pii_scrub regex cascade on both
    # engines — emails/IPs/phones never occur in the driver corpus
    (13, "mail bob@x.org ip 10.0.0.1 tel +15551234567 end", "en", "src2", 47),
]

EDGE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_capped",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "hll_distinct_texts",
    "hll_distinct_sources",
    "tfidf_top_terms",
    "inverted_index",
    "quantiles_by_lang",
    "median_chars_by_lang",
    "langid_heuristic",
    "token_count",
    "repetition_signals",
    "bloom_membership",
    "quantiles_approx_quality",
    "dedup_lines_global",
    "gopher_quality_flags",
    "pii_scrub",
    "contamination_3gram",
    "seq_pack",
    "audio_meta",
    "audio_frame_energy",
    "video_meta",
    # r6 additions: substring dedup (detect + apply) + bigram-LM filter
    "dedup_spans",
    "dedup_spans_cut",
    "lm_bigram_score",
    "bpe_top_pairs",
    "dedup_survivors",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    spark.createDataFrame(
        EDGE_ROWS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb

    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir, edge_duck):
    qdf = QUERIES[name](spark, edge_dir)
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = edge_duck.sql(ORACLES[name])
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _value_hash(spark_rows, qdf.columns) == _value_hash(duck_rows, res.columns), name
