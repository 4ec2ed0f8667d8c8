"""CCITT fax (T.4/T.6) decode lane.

SPEC DISCIPLINE: the ENCODER here is an independent transcription of
the T.4/T.6 coding procedures (mode selection over changing elements,
make-up/terminating run splitting, EOL/tag bits, byte alignment) — the
decoder must reconstruct every stream it emits exactly.  The run-length
code TABLES are data, not algorithm: the kernel's transcription is the
single copy (same standing as the Annex-K quant tables in
kernels/jpeg.py), pinned here three ways — structural invariants
(counts, per-class code-length ranges, prefix-freeness of every table
union), a hand-typed spot-check of the well-known short codes, and
hand-assembled bitstreams decoded against hand-derived rasters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.fax import (
    BLACK_CODES,
    EXT_CODES,
    WHITE_CODES,
    decode_g3,
    decode_g4,
    decode_mh,
)
from deepseek_ocr_spark.kernels.tiff import decode_tiff
from tests.test_tiff import build_tiff, gray_tags

# --- independent T.4/T.6 encoder ---------------------------------------------

_MODE_BITS = {0: "1", 1: "011", 2: "000011", 3: "0000011",
              -1: "010", -2: "000010", -3: "0000010"}


class _W:
    def __init__(self) -> None:
        self.s: list[str] = []

    def put(self, bits: str) -> None:
        self.s.append(bits)

    def align(self) -> None:
        n = len("".join(self.s)) % 8
        if n:
            self.put("0" * (8 - n))

    def bytes(self) -> bytes:
        s = "".join(self.s)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _enc_run(run: int, white: bool) -> str:
    table = WHITE_CODES if white else BLACK_CODES
    out = ""
    while run > 2560:
        out += EXT_CODES[2560]
        run -= 2560
    if run >= 1792:
        step = (run - 1792) // 64 * 64 + 1792
        out += EXT_CODES[step]
        run -= step
    elif run >= 64:
        step = run // 64 * 64
        out += table[step]
        run -= step
    return out + table[run]


def _transitions(row: np.ndarray) -> list[int]:
    t = []
    prev = 0
    for x, v in enumerate(row):
        if v != prev:
            t.append(x)
            prev = v
    return t


def _enc_1d_row(row: np.ndarray) -> str:
    w = len(row)
    out = ""
    pos = 0
    white = True
    trans = _transitions(row) + [w]
    for t in trans:
        out += _enc_run(t - pos, white)
        pos = t
        white = not white
        if pos >= w:
            break
    return out


def _enc_2d_row(row: np.ndarray, ref_trans: list[int]) -> str:
    """T.6 §2.2 coder: pass / vertical (|a1-b1| ≤ 3) / horizontal."""
    w = len(row)
    cur = _transitions(row)
    out = ""
    a0 = -1
    white = True
    while a0 < w:
        a1 = next((t for t in cur if t > a0), w)
        a2 = next((t for t in cur if t > a1), w)
        i = 0
        while i < len(ref_trans) and ref_trans[i] <= a0:
            i += 1
        if (i & 1) != (0 if white else 1):
            i += 1
        b1 = ref_trans[i] if i < len(ref_trans) else w
        b2 = ref_trans[i + 1] if i + 1 < len(ref_trans) else w
        if b2 < a1:
            out += "0001"  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            out += _MODE_BITS[a1 - b1]
            a0 = a1
            white = not white
        else:
            start = a0 if a0 > 0 else 0
            out += "001" + _enc_run(a1 - start, white) + _enc_run(a2 - a1, not white)
            a0 = a2
    return out


def ref_encode_g4(img: np.ndarray) -> bytes:
    w_ = _W()
    ref: list[int] = []
    for y in range(img.shape[0]):
        w_.put(_enc_2d_row(img[y], ref))
        ref = _transitions(img[y])
    return w_.bytes()


def ref_encode_mh(img: np.ndarray) -> bytes:
    w_ = _W()
    for y in range(img.shape[0]):
        w_.put(_enc_1d_row(img[y]))
        w_.align()
    return w_.bytes()


def ref_encode_g3(
    img: np.ndarray, two_dim: bool = False, oneD_rows: set[int] = frozenset()
) -> bytes:
    w_ = _W()
    ref: list[int] = []
    for y in range(img.shape[0]):
        w_.put("000000000001")  # EOL
        if two_dim:
            use_1d = y in oneD_rows or y == 0
            w_.put("1" if use_1d else "0")
            if use_1d:
                w_.put(_enc_1d_row(img[y]))
            else:
                w_.put(_enc_2d_row(img[y], ref))
        else:
            w_.put(_enc_1d_row(img[y]))
        ref = _transitions(img[y])
    return w_.bytes()


def _rand_bilevel(seed: int, h: int, w: int, p: float = 0.4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < p).astype(np.uint8)
    img[h // 2] = 0  # an all-white row
    if h > 3:
        img[h - 1] = 1  # an all-black row
    return img


# --- table pinning -----------------------------------------------------------


def test_table_structure_matches_t4():
    assert len(WHITE_CODES) == 64 + 27
    assert len(BLACK_CODES) == 64 + 27
    assert len(EXT_CODES) == 13
    assert set(EXT_CODES) == {1792 + 64 * i for i in range(13)}
    for run, bits in WHITE_CODES.items():
        if run < 64:
            assert 4 <= len(bits) <= 8, run
        else:
            assert 5 <= len(bits) <= 9, run
    for run, bits in BLACK_CODES.items():
        if run < 64:
            assert 2 <= len(bits) <= 13, run
        else:
            assert 10 <= len(bits) <= 13, run
    for bits in EXT_CODES.values():
        assert 11 <= len(bits) <= 12


@pytest.mark.parametrize(
    "codes", [WHITE_CODES, BLACK_CODES],
    ids=["white+ext", "black+ext"],
)
def test_tables_prefix_free(codes):
    allc = sorted({**codes, **EXT_CODES}.values(), key=len)
    for i, a in enumerate(allc):
        for b in allc[i + 1 :]:
            assert not b.startswith(a), (a, b)
        # EOL prefix must remain reserved
        assert not a.startswith("00000000"), a


def test_spot_check_well_known_codes():
    """Hand-typed from T.4 Tables 1/2 (the famous short codes) — an
    independent second keying of the highest-traffic entries."""
    spot_white = {2: "0111", 3: "1000", 4: "1011", 5: "1100", 6: "1110",
                  7: "1111", 1: "000111", 0: "00110101", 10: "00111",
                  11: "01000", 64: "11011", 128: "10010", 1664: "011000",
                  192: "010111", 63: "00110100"}
    spot_black = {1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
                  6: "0010", 7: "00011", 0: "0000110111", 8: "000101",
                  9: "000100", 64: "0000001111", 63: "000001100111"}
    for r, bits in spot_white.items():
        assert WHITE_CODES[r] == bits, r
    for r, bits in spot_black.items():
        assert BLACK_CODES[r] == bits, r


# --- hand-assembled bitstreams -----------------------------------------------


def test_g4_all_white_hand_bytes():
    """Each all-white row = one V0 bit ('1') straight to width: 3 rows
    → bits 111 + 00000 pad = 0xE0."""
    out = decode_g4(bytes([0b11100000]), 5, 3)
    assert out.tolist() == [[0] * 5] * 3


def test_mh_hand_assembled_row():
    """w=10: white 4 (1011), black 2 (11), white 4 (1011) →
    1011 11 1011 + 000000 pad = 0xBE 0xC0."""
    out = decode_mh(bytes([0xBE, 0xC0]), 10, 1)
    assert out.tolist() == [[0, 0, 0, 0, 1, 1, 0, 0, 0, 0]]


def test_g4_hand_vertical_and_horizontal():
    """Row 1: H mode (001) white 2 (0111) black 3 (10), then V0 to end.
    Row 2 vs row 1: V0,V0 then V0 → identical row."""
    w = _W()
    w.put("001" + "0111" + "10" + "1")  # H(2w,3b) then V0 (b1=width)
    w.put("1" + "1" + "1")  # row 2: three V0s track row 1's transitions
    out = decode_g4(w.bytes(), 8, 2)
    expect = [0, 0, 1, 1, 1, 0, 0, 0]
    assert out.tolist() == [expect, expect]


def test_g3_eol_with_fill_bits():
    w = _W()
    w.put("0000" + "000000000001")  # fill + EOL
    w.put("1000" + "0111")  # white 3, (then black… w=3 ends at width)
    out = decode_g3(w.bytes(), 3, 1)
    assert out.tolist() == [[0, 0, 0]]


# --- round-trips against the independent encoder -----------------------------


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_g4_roundtrip_random(seed):
    img = _rand_bilevel(seed, 13, 37)
    assert np.array_equal(decode_g4(ref_encode_g4(img), 37, 13), img)


def test_g4_roundtrip_structured():
    img = np.zeros((9, 64), np.uint8)
    img[2:7, 10:50] = 1  # a box: exercises V0 tracking
    img[4, :] = 0
    img[4, 0] = 1  # black pixel at x=0: H mode with white run 0
    assert np.array_equal(decode_g4(ref_encode_g4(img), 64, 9), img)


def test_mh_roundtrip_long_runs():
    img = np.zeros((4, 3000), np.uint8)
    img[0, 2900:] = 1  # white 2900 (ext make-up 2560+…): black 100
    img[1, :70] = 1  # black 70: make-up 64 + term 6
    img[2, :] = 1  # black 3000: ext make-up beyond 2560
    assert np.array_equal(decode_mh(ref_encode_mh(img), 3000, 4), img)


@pytest.mark.parametrize("two_dim", [False, True])
def test_g3_roundtrip(two_dim):
    img = _rand_bilevel(7, 10, 29)
    data = ref_encode_g3(img, two_dim=two_dim, oneD_rows={0, 5})
    assert np.array_equal(decode_g3(data, 29, 10, two_dim=two_dim), img)


def test_g4_pass_mode():
    """Ref row has a short black island the coding row skips entirely —
    forces the pass code path on both sides."""
    img = np.zeros((2, 20), np.uint8)
    img[0, 5:8] = 1
    img[1, 12:15] = 1
    data = ref_encode_g4(img)
    assert np.array_equal(decode_g4(data, 20, 2), img)


# --- TIFF integration --------------------------------------------------------


def _fax_tiff(img: np.ndarray, comp: int, photo: int = 0, fillorder: int = 1,
              rps: int | None = None, t4opts: int | None = None) -> bytes:
    h, w = img.shape
    rps = rps or h
    chunks = []
    enc = {2: ref_encode_mh, 3: ref_encode_g3, 4: ref_encode_g4}[comp]
    for y0 in range(0, h, rps):
        part = img[y0 : y0 + rps]
        data = enc(part) if comp != 3 else ref_encode_g3(
            part, two_dim=bool((t4opts or 0) & 1)
        )
        if fillorder == 2:
            data = bytes(int(f"{b:08b}"[::-1], 2) for b in data)
        chunks.append(data)
    over = {258: (3, [1]), 259: (3, [comp]), 262: (3, [photo]),
            266: (3, [fillorder])}
    if t4opts is not None:
        over[292] = (4, [t4opts])
    return build_tiff(gray_tags(w, h, rps, over=over), chunks)


def test_tiff_g4_white_is_zero():
    img = _rand_bilevel(21, 8, 33)
    got = decode_tiff(_fax_tiff(img, 4, photo=0))
    # photometric 0: ink 1 (black) → 0, white → 255
    expect = ((1 - img) * 255).astype(np.uint8).tobytes()
    assert got == (33, 8, 1, expect)


def test_tiff_g4_black_is_zero_and_strips():
    img = _rand_bilevel(22, 9, 17)
    got = decode_tiff(_fax_tiff(img, 4, photo=1, rps=3))
    expect = ((1 - img) * 255).astype(np.uint8).tobytes()
    assert got == (17, 9, 1, expect)


def test_tiff_g4_fillorder2():
    img = _rand_bilevel(23, 6, 41)
    got = decode_tiff(_fax_tiff(img, 4, fillorder=2))
    expect = ((1 - img) * 255).astype(np.uint8).tobytes()
    assert got == (41, 6, 1, expect)


def test_tiff_mh_and_g3_variants():
    img = _rand_bilevel(24, 7, 23)
    expect = ((1 - img) * 255).astype(np.uint8).tobytes()
    assert decode_tiff(_fax_tiff(img, 2)) == (23, 7, 1, expect)
    assert decode_tiff(_fax_tiff(img, 3, t4opts=0)) == (23, 7, 1, expect)
    assert decode_tiff(_fax_tiff(img, 3, t4opts=1)) == (23, 7, 1, expect)


def test_tiff_fax_gates_remain():
    img = _rand_bilevel(25, 4, 9)
    data = _fax_tiff(img, 4, t4opts=None)
    # uncompressed-mode option bit still gates
    bad = _fax_tiff(img, 3, t4opts=2)
    with pytest.raises(NotImplementedError):
        decode_tiff(bad)
    # CCITT outside bilevel gates
    over = {258: (3, [8]), 259: (3, [4])}
    with pytest.raises(NotImplementedError):
        decode_tiff(build_tiff(gray_tags(9, 4, 4, over=over), [b"\x00" * 36]))
    assert decode_tiff(data)[0] == 9


# --- hostile-input contract --------------------------------------------------


def test_truncation_and_mutation_value_error_only():
    img = _rand_bilevel(26, 6, 21)
    data = _fax_tiff(img, 4)
    for cut in range(8, len(data), 3):
        try:
            decode_tiff(data[:cut])
        except (ValueError, NotImplementedError):
            pass
    buf = bytearray(data)
    rng = np.random.default_rng(27)
    for _ in range(300):
        i = int(rng.integers(8, len(buf)))
        old = buf[i]
        buf[i] = int(rng.integers(0, 256))
        try:
            decode_tiff(bytes(buf))
        except (ValueError, NotImplementedError):
            pass
        buf[i] = old


def test_direct_decoders_reject_bad_dims():
    with pytest.raises(ValueError):
        decode_g4(b"", 0, 4)
    with pytest.raises(ValueError):
        decode_mh(b"", 70000, 70000)
