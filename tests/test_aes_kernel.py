"""kernels/aescrypt.py pinned against the PUBLISHED known-answer vectors.

The block cipher is pinned on FIPS-197 Appendix C (C.1/C.2/C.3) and CBC
mode on NIST SP 800-38A F.2 — implementation-independent specs shared by
every conforming AES implementation, the same role the public RC4
vectors play for pdftext._rc4. The numpy bulk-decrypt lane is pinned
byte-equal to the scalar `_py_*` oracle lane (pixels.py discipline).
"""

import random

import pytest

from deepseek_ocr_spark.kernels import aescrypt as A

_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_known_answers():
    # Appendix C.1 (AES-128), C.2 (AES-192), C.3 (AES-256)
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, ct_hex in cases:
        ct = A.encrypt_block(key, _FIPS_PT)
        assert ct.hex() == ct_hex
        assert A._py_decrypt_block(A.key_schedule(key), ct) == _FIPS_PT


def test_sbox_spot_values():
    # FIPS-197 Figure 7 spot checks — the generated table must agree with
    # the published one.
    assert A._SBOX[0x00] == 0x63
    assert A._SBOX[0x01] == 0x7C
    assert A._SBOX[0x53] == 0xED
    assert A._SBOX[0xFF] == 0x16
    assert A._INV_SBOX[0x00] == 0x52
    assert A._INV_SBOX[A._SBOX[0xA7]] == 0xA7


_NIST_PT4 = bytes.fromhex(
    "6bc1bee22e409f96e93d7e117393172a"
    "ae2d8a571e03ac9c9eb76fac45af8e51"
    "30c81c46a35ce411e5fbc1191a0a52ef"
    "f69f2445df4f9b17ad2b417be66c3710"
)
_NIST_IV = bytes.fromhex("000102030405060708090a0b0c0d0e0f")


@pytest.mark.parametrize(
    "key_hex, ct_hex",
    [
        (  # SP 800-38A F.2.1 CBC-AES128
            "2b7e151628aed2a6abf7158809cf4f3c",
            "7649abac8119b246cee98e9b12e9197d"
            "5086cb9b507219ee95db113a917678b2"
            "73bed6b8e3c1743b7116e69e22229516"
            "3ff1caa1681fac09120eca307586e1a7",
        ),
        (  # SP 800-38A F.2.5 CBC-AES256
            "603deb1015ca71be2b73aef0857d7781"
            "1f352c073b6108d72d9810a30914dff4",
            "f58c4c04d6e5f1ba779eabfb5f7bfbd6"
            "9cfc4e967edb808d679f777bc6702c7d"
            "39f23369a9d9bacfa530e26304231461"
            "b2eb05e2c39be9fcda6c19078c6a9d1b",
        ),
    ],
)
def test_sp800_38a_cbc(key_hex, ct_hex):
    key = bytes.fromhex(key_hex)
    ct = A.cbc_encrypt(key, _NIST_IV, _NIST_PT4, pad=False)
    assert ct.hex() == ct_hex
    assert A.cbc_decrypt(key, _NIST_IV, ct, unpad=False) == _NIST_PT4


def test_numpy_lane_matches_scalar_oracle():
    rng = random.Random(1)
    for klen in (16, 24, 32):
        key = bytes(rng.randrange(256) for _ in range(klen))
        rk = A.key_schedule(key)
        for nblocks in (1, 3, 4, 5, 64, 65):
            data = bytes(rng.randrange(256) for _ in range(16 * nblocks))
            assert A._np_ecb_decrypt(rk, data) == A._py_ecb_decrypt(rk, data)


def test_cbc_pkcs7_roundtrip_and_bad_padding():
    rng = random.Random(2)
    key = bytes(rng.randrange(256) for _ in range(16))
    iv = bytes(rng.randrange(256) for _ in range(16))
    for n in (0, 1, 15, 16, 17, 100):
        pt = bytes(rng.randrange(256) for _ in range(n))
        ct = A.cbc_encrypt(key, iv, pt)
        assert len(ct) % 16 == 0 and len(ct) >= 16
        assert A.cbc_decrypt(key, iv, ct) == pt
    # corrupting the last block breaks padding with overwhelming probability
    ct = A.cbc_encrypt(key, iv, b"hello world")
    bad = ct[:-1] + bytes([ct[-1] ^ 0xFF])
    with pytest.raises(ValueError):
        A.cbc_decrypt(key, iv, bad)


def test_hostile_sizes_raise_valueerror_only():
    with pytest.raises(ValueError):
        A.key_schedule(b"short")
    with pytest.raises(ValueError):
        A.encrypt_block(bytes(16), b"not a block")
    with pytest.raises(ValueError):
        A.cbc_decrypt(bytes(16), bytes(16), b"notaligned!")
    with pytest.raises(ValueError):
        A.cbc_decrypt(bytes(16), bytes(16), b"")  # empty with unpad=True
    with pytest.raises(ValueError):
        A.cbc_encrypt(bytes(16), bytes(16), b"x", pad=False)
    with pytest.raises(ValueError):
        A.cbc_encrypt(bytes(16), b"shortiv", b"x")
