"""Vision-token formula vs the reference mode table (FIXTURES.md §3b;
reference README R:190-197, vllm/deepseek_ocr.py:95-106)."""

from deepseek_ocr_spark.kernels.tokens import grid_side, num_text_tokens, num_vision_tokens


def test_grid_sides():
    assert grid_side(512) == 8
    assert grid_side(640) == 10
    assert grid_side(1024) == 16
    assert grid_side(1280) == 20


def test_mode_table_grid_tokens():
    # R:192-195: grid tokens = side^2
    assert grid_side(512) ** 2 == 64
    assert grid_side(640) ** 2 == 100
    assert grid_side(1024) ** 2 == 256
    assert grid_side(1280) ** 2 == 400


def test_full_sequence_counts():
    # base=1024 global only: 16*17 + 1 = 273 (FIXTURES.md §3b)
    assert num_vision_tokens(1, 1, base_size=1024, image_size=640) == 273
    # Gundam (2,2): + (2*10)*(2*10+1) = 420
    assert num_vision_tokens(2, 2, base_size=1024, image_size=640) == 273 + 420
    # (2,1): + (1*10)*(2*10+1) = 210
    assert num_vision_tokens(2, 1, base_size=1024, image_size=640) == 273 + 210
    # tiny 512 no crop: 8*9+1 = 73
    assert num_vision_tokens(1, 1, base_size=512, image_size=512) == 73


def test_text_tokens_proxy():
    assert num_text_tokens("") == 0
    assert num_text_tokens("hello world") == 2
    assert num_text_tokens("a, b!") == 4  # a , b !
    assert num_text_tokens("x1y2") == 1
    assert num_text_tokens("a_b") == 3  # underscore is punctuation, not \w


def test_token_regex_predicates_match_str_methods():
    """The regex token lane is exact ONLY because sre's \\w is
    isalnum ∪ {_} and \\s is isspace — pin that over every codepoint a
    corpus can contain (BMP + a supplementary sample) so a Python/Unicode
    upgrade that shifts either predicate fails loudly here, not as a
    silent token-count drift."""
    import re

    w, s = re.compile(r"\w"), re.compile(r"\s")
    cps = list(range(0x10000)) + list(range(0x1F300, 0x1F400)) + [0x10FFFF]
    for cp in cps:
        ch = chr(cp)
        assert (w.match(ch) is not None) == (ch.isalnum() or ch == "_"), hex(cp)
        assert (s.match(ch) is not None) == ch.isspace(), hex(cp)


def test_num_text_tokens_regex_equals_per_char_oracle():
    from deepseek_ocr_spark.kernels.tokens import _py_num_text_tokens
    from hypothesis import given, settings, strategies as st

    fixed = [
        "", " ", "a", "_", "a_b c!d", "你好, 世界", "é́ combininǵ mark",
        "tab\tand\nnewline", "1 000 000", "a" * 500, ". , ; :" * 40,
    ]
    for t in fixed:
        assert num_text_tokens(t) == _py_num_text_tokens(t), repr(t)

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def prop(t):
        assert num_text_tokens(t) == _py_num_text_tokens(t)

    prop()
