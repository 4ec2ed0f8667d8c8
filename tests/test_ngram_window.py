"""O-28 analog: the relational repeat flag must equal the reference's
decode-time ban condition (process/ngram_norepeat.py:19-40) replayed over a
known token sequence."""

import random

import pytest

from deepseek_ocr_spark.operators.ngram_window import ngram_repeat_flags


def reference_would_ban(tokens: list[str], p: int, n: int, window_size: int) -> bool:
    """Direct transcription of NoRepeatNGramLogitsProcessor.__call__ asking:
    would the reference have banned tokens[p] at the step that generated it?
    input_ids = tokens[:p]; banned iff some n-gram in the trailing window
    has prefix == last n-1 tokens and final == tokens[p]."""
    input_ids = tokens[:p]
    if len(input_ids) < n - 1:
        return False
    current_prefix = tuple(input_ids[len(input_ids) - (n - 1):])
    search_start = max(0, len(input_ids) - window_size)
    search_end = len(input_ids) - n + 1
    for i in range(search_start, search_end):
        ngram = tuple(tokens[i : i + n])
        if ngram[:-1] == current_prefix and ngram[-1] == tokens[p]:
            return True
    return False


@pytest.mark.parametrize("n,ref_window", [(3, 8), (2, 5), (4, 12)])
def test_flags_equal_reference_ban_semantics(n, ref_window, spark):
    rng = random.Random(1234 + n * 100 + ref_window)
    seqs = {
        doc_id: [rng.choice("abc") for _ in range(rng.randint(n, 40))]
        for doc_id in range(40)
    }
    # hand-picked pathological runs on top of the random batch
    seqs[100] = list("aaaaaaaaaaaa")           # solid repeat run
    seqs[101] = list("abcabcabcabc")           # period-3 cycle
    seqs[102] = list("abc") + list("x" * 15) + list("abc")  # repeat outside window
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in seqs.items()], "doc_id long, text string"
    )
    # reference window_size W over start positions == our end-to-end window
    # of W - n + 1 (see module docstring)
    ours = {
        (r["doc_id"], r["pos"]): r["is_repeat"]
        for r in ngram_repeat_flags(docs, n=n, window=ref_window - n + 1).collect()
    }
    for d, tokens in seqs.items():
        for p in range(n - 1, len(tokens)):
            want = reference_would_ban(tokens, p, n, ref_window)
            assert ours[(d, p)] == want, (d, tokens, p, n, ref_window)
