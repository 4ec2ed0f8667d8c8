"""Training-data pipeline operators: PII scrubbing, benchmark
contamination flagging, sequence packing.

The three canonical LLM-corpus jobs the dedup/quality families did not yet
cover.  All pure Catalyst (regexp / broadcast semi-join / windowed cumsum)
— no Python on the data path — with exact DuckDB oracles.

Scale shapes:
- pii_scrub: map-only regexp projection, embarrassingly parallel.
- contamination_flags: the benchmark n-gram set is tiny and BROADCAST;
  the corpus side explodes n-grams map-side and aggregates per doc in one
  shuffle.  No corpus self-join.
- seq_pack: P independent shard-local packing problems (shard = doc_id %
  P), each a windowed cumulative sum — at 100 TB pick P so a shard fits a
  task; a single global window would serialize the corpus through one
  partition, which is exactly what the shard split avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Conservative patterns with identical semantics in Java regex (Spark) and
# RE2 (DuckDB): greedy character-class quantifiers only — no alternation
# where leftmost-first vs leftmost-longest could diverge.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}\b"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones) — redact emails,
    IPv4 addresses and +international phone numbers with typed placeholder
    tokens, counting each.  Replacement cascades email → ip → phone (an
    email never contains an IP-shaped substring after redaction, so the
    cascade order is the deterministic contract, mirrored in the oracle)."""
    t = F.col("text")
    # Python-API regexp functions (NOT F.expr): a SQL string literal would
    # eat the pattern backslashes (\b, \d) — the classic Spark-SQL escape trap
    emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    ips = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
    phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        # size(NULL array) is -1 in Spark; null text must yield NULL counts
        # like the SQL side, so gate on text nullability
        F.when(t.isNull(), F.lit(None)).otherwise(emails).cast("int").alias("n_emails"),
        F.when(t.isNull(), F.lit(None)).otherwise(ips).cast("int").alias("n_ips"),
        F.when(t.isNull(), F.lit(None)).otherwise(phones).cast("int").alias("n_phones"),
    )


def pii_scrub_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones
FROM {table}
"""


NGRAM_N = 3
BENCH_MOD = 23  # doc_id % BENCH_MOD == 0 plays the held-out benchmark set


def _grams(col: str = "text"):
    toks = F.filter(F.split(F.col(col), " "), lambda t: t != "")
    n = F.size(toks)
    return F.when(
        n >= NGRAM_N,
        F.transform(
            F.sequence(F.lit(1), n - (NGRAM_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM_N)),
        ),
    ).otherwise(F.array())


def _token_hashes(col: str = "text"):
    """array<bigint> of per-TOKEN 60-bit md5 hashes.
    conv(substr(md5(t),1,15),16,10) in Spark ≡
    ('0x' || substr(md5(t),1,15))::BIGINT in DuckDB (15 hex chars < 2^60,
    unsigned in both engines — same parity trick as bloom_membership /
    stratified_sample)."""
    toks = F.filter(F.split(F.col(col), " "), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )


def _rot60(c, s: int):
    """60-bit left rotation via masked shifts — the mask keeps every
    intermediate < 2^60 so DuckDB's checked BIGINT shift cannot overflow
    (the mirrored SQL uses the identical expression)."""
    lo = (1 << (60 - s)) - 1
    return F.shiftleft(c.bitwiseAND(F.lit(lo)), s).bitwiseOR(F.shiftright(c, 60 - s))


def _gram_digest_exprs(hcol):
    """array<bigint> of 60-bit n-gram digests over a MATERIALIZED
    token-hash column: digest(i) = h[i] ⊕ rot20(h[i+1]) ⊕ rot40(h[i+2]).
    The position-dependent rotations make the combination order-sensitive;
    collisions are ~2^-60 per distinct-gram pair and BOTH engines compute
    the identical digest, so oracle parity is exact.

    hcol MUST be a projected column, not the _token_hashes expression
    inline: element_at over an inline transform re-evaluates the whole
    transform per element (measured: 79s vs 0.64s at sf0.1 — O(n²) in doc
    length).  Catalyst's CollapseProject keeps the two projections apart
    because the alias is referenced many times and is non-trivial."""
    n = F.size(hcol)
    return F.when(
        n >= NGRAM_N,
        F.transform(
            F.sequence(F.lit(1), n - (NGRAM_N - 1)),
            lambda i: F.element_at(hcol, i)
            .bitwiseXOR(_rot60(F.element_at(hcol, i + F.lit(1)), 20))
            .bitwiseXOR(_rot60(F.element_at(hcol, i + F.lit(2)), 40)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def contamination_flags(
    docs: DataFrame, bench_mod: int = BENCH_MOD, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every NON-benchmark doc — the
    decontamination pass: a training doc sharing any word {n}-gram with
    the held-out benchmark set (here: doc_id % bench_mod == 0) is flagged;
    n_hits counts DISTINCT shared n-grams.  The benchmark gram set is
    small by construction → broadcast; the corpus crosses the network
    once, aggregated per doc.  Every distinct/broadcast/join/agg is keyed
    on a 60-bit gram DIGEST (see _gram_digest_exprs) — md5 cost is linear
    in TOKENS (hashed once each, never per gram), no gram string is ever
    materialized, and the exchanged payload is BIGINTs, not ~25-byte
    strings."""
    assert n == NGRAM_N, "gram width is baked into the shared digest exprs"
    is_bench = F.col("doc_id") % bench_mod == 0
    hdf = docs.select("doc_id", _token_hashes().alias("h"))
    grams = hdf.select(
        "doc_id", F.explode(_gram_digest_exprs(F.col("h"))).alias("g")
    )
    bench_grams = grams.filter(is_bench).select("g").distinct()
    corpus = docs.filter(~is_bench)
    hits = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_flags_sql(
    table: str = "documents", bench_mod: int = BENCH_MOD, n: int = NGRAM_N
) -> str:
    # mirrors _token_hashes + _gram_digest_exprs bit-for-bit: 60-bit token
    # md5 window, position-rotated XOR combine (masked shifts keep every
    # intermediate < 2^60 — DuckDB BIGINT shifts are overflow-checked)
    rot20 = f"((((h[i+1]) & {(1 << 40) - 1}) << 20) | ((h[i+1]) >> 40))"
    rot40 = f"((((h[i+2]) & {(1 << 20) - 1}) << 40) | ((h[i+2]) >> 20))"
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
  FROM {table}
),
tokh AS (
  SELECT doc_id,
         list_transform(tk,
             t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS h
  FROM toks
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(h) >= {n}
                THEN list_transform(range(1, len(h) - {n} + 2),
                     i -> xor(xor(h[i], {rot20}), {rot40}))
                ELSE [] END) AS g
  FROM tokh
),
bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0
),
corpus AS (SELECT doc_id FROM {table} WHERE doc_id % {bench_mod} != 0),
hits AS (
  SELECT gr.doc_id, count(DISTINCT gr.g) AS n_hits
  FROM grams gr JOIN bench b USING (g)
  WHERE gr.doc_id % {bench_mod} != 0
  GROUP BY gr.doc_id
)
SELECT c.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id)
"""


PACK_MAX_TOKENS = 256
PACK_SHARDS = 64  # registered/benched P — large enough that no shard is a
# giant sort partition at the tested SFs; the deployable default below
# scales P with the session instead of pinning it


def seq_pack(
    docs: DataFrame,
    max_tokens: int = PACK_MAX_TOKENS,
    n_shards: int | None = None,
) -> DataFrame:
    """(doc_id, shard, n_tokens, bin_ix) — sequence packing for training:
    greedy sorted-fill of whitespace-token counts into bins of
    ``max_tokens``, independently per shard (shard = doc_id % n_shards).
    bin_ix = floor(exclusive-prefix-sum / max_tokens) within the shard's
    (n_tokens DESC, doc_id) order — deterministic, and a doc longer than
    max_tokens simply spans bins on its own.  NULL-text docs are excluded
    (nothing to pack).

    ``n_shards=None`` (the deployable default) derives P from the
    session's ``spark.sql.shuffle.partitions`` — sized for the cluster,
    so each shard's window sort fits one task at any scale; a single
    global window (P=1) would serialize the corpus through one partition.
    Pass an explicit P when a downstream layout pins it (the registry
    passes PACK_SHARDS so the DuckDB oracle can mirror the value)."""
    if n_shards is None:
        n_shards = max(
            PACK_SHARDS,
            int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
        )
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / max_tokens).cast("bigint").alias("bin_ix"),
    )


def seq_pack_sql(
    table: str = "documents",
    max_tokens: int = PACK_MAX_TOKENS,
    n_shards: int = PACK_SHARDS,
) -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % {n_shards} AS INT) AS shard,
         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT)
           AS n_tokens
  FROM {table} WHERE text IS NOT NULL
)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard
                     ORDER BY n_tokens DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / {max_tokens}) AS BIGINT) AS bin_ix
FROM base
"""
