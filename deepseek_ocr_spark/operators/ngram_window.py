"""O-28 relational analog — sliding-window duplicate n-gram detector.

The reference's ``NoRepeatNGramLogitsProcessor`` (process/ngram_norepeat.py:
8-40) bans, at each decode step, any token that would complete an n-gram
already present in the trailing ``window_size`` tokens. The sequential
decode-time rule has no batch output to match byte-for-byte, so this module
ships the RELATIONAL analog over a token table: flag every n-gram occurrence
that repeats an earlier occurrence within the window — exactly the condition
under which the reference would have banned the n-gram's final token.

Plan shape (100 TB notes): tokens explode linearly from text; the gram
column is a chain of ``lag()`` over (doc_id, pos) — one shuffle on doc_id,
bounded state (n-1 rows per partition frame). The repeat flag is ``lag(pos)``
over (doc_id, gram) — the closest earlier occurrence is the max, so "any
occurrence within the window" reduces to one lag, no self-join and no
rowsBetween scan of the whole window. Both windows are sort-based and
spill-able; no per-group collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NGRAM_SIZE = 3
WINDOW_SIZE = 20  # reference default is 100 decode tokens; 20 suits doc scale

# Window mapping to the reference (tests/test_ngram_window.py proves it):
# the reference scans occurrence START positions i >= len(input_ids) - W
# (ngram_norepeat.py:24-30), which for the gram ending at position p means
# an earlier occurrence ending at p' with p - p' <= W - n + 1. Our
# ``window`` parameter measures that end-to-end distance directly, so
# reference window_size W  ⇔  window = W - n + 1.


def ngram_repeat_flags(
    docs: DataFrame, n: int = NGRAM_SIZE, window: int = WINDOW_SIZE
) -> DataFrame:
    """(doc_id, pos, gram, is_repeat) — one row per n-gram occurrence (pos =
    position of the gram's final token); ``is_repeat`` iff the same gram
    ended at some pos' < pos with pos - pos' <= window."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    seq = Window.partitionBy("doc_id").orderBy("pos")
    gram_parts = [F.lag("token", n - 1 - i).over(seq) for i in range(n - 1)]
    gram_parts.append(F.col("token"))
    grams = toks.select(
        "doc_id", "pos", F.concat_ws(" ", *gram_parts).alias("gram")
    ).filter(F.col("pos") >= n - 1)
    per_gram = Window.partitionBy("doc_id", "gram").orderBy("pos")
    return grams.select(
        "doc_id",
        "pos",
        "gram",
        (
            F.lag("pos", 1).over(per_gram).isNotNull()
            & (F.col("pos") - F.lag("pos", 1).over(per_gram) <= window)
        ).alias("is_repeat"),
    )


def ngram_repeat_flags_sql(
    table: str = "documents", n: int = NGRAM_SIZE, window: int = WINDOW_SIZE
) -> str:
    lags = ", ".join(
        [f"lag(token, {n - 1 - i}) OVER seq" for i in range(n - 1)] + ["token"]
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(range(len(l))) AS pos, unnest(l) AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM {table})
),
grams AS (
  SELECT doc_id, pos, concat_ws(' ', {lags}) AS gram
  FROM toks WINDOW seq AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id, pos, gram,
       (lag(pos, 1) OVER pg IS NOT NULL
        AND pos - lag(pos, 1) OVER pg <= {window}) AS is_repeat
FROM grams
WHERE pos >= {n - 1}
WINDOW pg AS (PARTITION BY doc_id, gram ORDER BY pos)
"""
