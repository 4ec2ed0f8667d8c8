"""Vision-token accounting — the observable of the "optical compression".

Reproduces ``get_num_image_tokens`` (reference vllm/deepseek_ocr.py:61-106):

    h = w  = ceil((base_size / patch_size) / downsample_ratio)
    h2 = w2 = ceil((image_size / patch_size) / downsample_ratio)
    global = h * (w + 1)                       # +1 = per-row newline token
    local  = (nh*h2) * (nw*w2 + 1)  if tiled else 0
    total  = global + local + 1                # +1 = view separator

Mode table (reference README R:190-197): 512→64, 640→100, 1024→256,
1280→400 grid tokens; Gundam = n×100 local + 256 global (+ overhead).
"""

from __future__ import annotations

import math

from deepseek_ocr_spark.config import (
    BASE_SIZE,
    DOWNSAMPLE_RATIO,
    IMAGE_SIZE,
    PATCH_SIZE,
)


def grid_side(size: int) -> int:
    """Tokens per side after patchify + 4x downsample (deepseek_ocr.py:95-97)."""
    return math.ceil((size // PATCH_SIZE) / DOWNSAMPLE_RATIO)


def num_vision_tokens(
    nw: int,
    nh: int,
    base_size: int = BASE_SIZE,
    image_size: int = IMAGE_SIZE,
) -> int:
    """Full per-page vision-token count (deepseek_ocr.py:95-106)."""
    h = w = grid_side(base_size)
    h2 = w2 = grid_side(image_size)
    global_tokens = h * (w + 1)
    if nw > 1 or nh > 1:
        local_tokens = (nh * h2) * (nw * w2 + 1)
    else:
        local_tokens = 0
    return global_tokens + local_tokens + 1


# One token per alnum RUN or per non-alnum non-space CHAR. Exactly the
# _py_num_text_tokens predicate set: CPython's sre \w is isalnum ∪ {_}
# and \s is isspace (verified over every codepoint in
# tests/test_tokens.py::test_token_regex_predicates_match_str_methods),
# so [^\W_]+ = alnum run and [^\w\s]|_ = punctuation char — the regex
# lane is ~8× the per-char loop and provably identical.
import re as _re

_TOKEN_RE = _re.compile(r"[^\W_]+|[^\w\s]|_")


def num_text_tokens(text: str) -> int:
    """Deterministic text-token count for the compression-ratio metric
    (reference flag PRINT_NUM_VIS_TOKENS, config.py:15; ratio notion from
    the paper's optical-compression claim, R:37-38).

    No tokenizer in the sandbox → whitespace-split plus punctuation runs:
    a stable BPE-ish proxy shared by oracle and engine."""
    if not text:
        return 0
    return len(_TOKEN_RE.findall(text))


def _py_num_text_tokens(text: str) -> int:
    """Per-char oracle lane for num_text_tokens (the original definition;
    tests pin the regex lane equal on fixed + fuzzed inputs)."""
    if not text:
        return 0
    n = 0
    in_word = False
    for ch in text:
        if ch.isalnum():
            if not in_word:
                n += 1
                in_word = True
        else:
            in_word = False
            if not ch.isspace():
                n += 1
    return n
