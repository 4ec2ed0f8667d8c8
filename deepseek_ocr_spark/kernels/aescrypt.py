"""AES (FIPS-197) block cipher + CBC mode — stdlib + optional numpy.

Consumed by kernels/pdftext.py for AES-encrypted PDFs (ISO 32000 §7.6
standard security handler, /CFM /AESV2 = AES-128-CBC and /AESV3 =
AES-256-CBC) and by the encrypted-PDF fixture writers. The reference
pipeline inherits this capability from fitz/PyMuPDF, which opens
AES-encrypted documents transparently (vllm/run_dpsk_ocr_pdf.py:64-95);
this module is the in-sandbox stdlib equivalent.

Design notes:
- The S-box is GENERATED from its GF(2^8) definition (multiplicative
  inverse + affine map, FIPS-197 §5.1.1) rather than transcribed, so a
  typo cannot silently corrupt one entry; the whole cipher is pinned
  against the published FIPS-197 Appendix C known-answer vectors and the
  NIST SP 800-38A CBC vectors in tests/test_aes_kernel.py.
- CBC *decryption* parallelizes across blocks (each plaintext block
  depends only on two ciphertext blocks), so bulk decrypt runs a
  numpy-vectorized ECB lane; the pure-Python scalar lane (`_py_*`) is
  the oracle, pinned byte-equal in tests (same discipline as
  kernels/pixels.py's numpy/_py split).
- Encryption is only needed for small inputs (fixture writers, the
  ISO 32000-2 Algorithm 2.B KDF), so it stays scalar.

Hostile-input contract: public entry points raise ValueError only for
malformed input (bad key size, non-block-aligned data, bad padding).
"""

from __future__ import annotations

try:
    import numpy as _np
except Exception:  # pragma: no cover - numpy is baked into the sandbox
    _np = None

# --- GF(2^8) tables, generated (FIPS-197 §4.2, §5.1.1) ----------------------


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


_GF_INV = [0] * 256
for _x in range(1, 256):
    for _y in range(1, 256):
        if _gmul(_x, _y) == 1:
            _GF_INV[_x] = _y
            break

_SBOX = bytes(
    _GF_INV[x]
    ^ _rotl8(_GF_INV[x], 1)
    ^ _rotl8(_GF_INV[x], 2)
    ^ _rotl8(_GF_INV[x], 3)
    ^ _rotl8(_GF_INV[x], 4)
    ^ 0x63
    for x in range(256)
)
_INV_SBOX = bytes(_SBOX.index(i) for i in range(256))

# multiplication LUTs for (Inv)MixColumns
_M2 = bytes(_gmul(x, 2) for x in range(256))
_M3 = bytes(_gmul(x, 3) for x in range(256))
_M9 = bytes(_gmul(x, 9) for x in range(256))
_MB = bytes(_gmul(x, 0xB) for x in range(256))
_MD = bytes(_gmul(x, 0xD) for x in range(256))
_ME = bytes(_gmul(x, 0xE) for x in range(256))

# byte-index maps for ShiftRows on the flat column-major block layout
# (byte j = 4*col + row): new[j] = old[_SHIFT[j]]
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]

_RCON = [0x00, 0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def key_schedule(key: bytes) -> list[bytes]:
    """Round keys (Nr+1 × 16 bytes) for a 16/24/32-byte key (FIPS-197 §5.2)."""
    if len(key) not in (16, 24, 32):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    flat = bytes(b for word in w for b in word)
    return [flat[16 * r : 16 * r + 16] for r in range(nr + 1)]


# --- scalar lanes (the oracle) -----------------------------------------------


def _py_encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytearray(x ^ k for x, k in zip(block, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr):
        s = bytearray(_SBOX[s[i]] for i in _SHIFT)  # SubBytes ∘ ShiftRows
        t = bytearray(16)
        for c in (0, 4, 8, 12):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            t[c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            t[c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            t[c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        s = bytearray(x ^ k for x, k in zip(t, rk[rnd]))
    s = bytearray(_SBOX[s[i]] for i in _SHIFT)
    return bytes(x ^ k for x, k in zip(s, rk[nr]))


def _py_decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(x ^ k for x, k in zip(block, rk[nr]))
    for rnd in range(nr - 1, 0, -1):
        s = bytearray(_INV_SBOX[s[i]] for i in _INV_SHIFT)
        s = bytearray(x ^ k for x, k in zip(s, rk[rnd]))
        t = bytearray(16)
        for c in (0, 4, 8, 12):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _ME[a0] ^ _MB[a1] ^ _MD[a2] ^ _M9[a3]
            t[c + 1] = _M9[a0] ^ _ME[a1] ^ _MB[a2] ^ _MD[a3]
            t[c + 2] = _MD[a0] ^ _M9[a1] ^ _ME[a2] ^ _MB[a3]
            t[c + 3] = _MB[a0] ^ _MD[a1] ^ _M9[a2] ^ _ME[a3]
        s = t
    s = bytearray(_INV_SBOX[s[i]] for i in _INV_SHIFT)
    return bytes(x ^ k for x, k in zip(s, rk[0]))


def _py_ecb_decrypt(rk: list[bytes], data: bytes) -> bytes:
    return b"".join(
        _py_decrypt_block(rk, data[i : i + 16]) for i in range(0, len(data), 16)
    )


# --- numpy ECB lane (bulk decrypt hot path) ----------------------------------


def _np_ecb_decrypt(rk: list[bytes], data: bytes) -> bytes:
    sb = _np.frombuffer(_INV_SBOX, _np.uint8)
    ish = _np.array(_INV_SHIFT)
    m9, mb, md, me = (
        _np.frombuffer(t, _np.uint8) for t in (_M9, _MB, _MD, _ME)
    )
    rks = [_np.frombuffer(k, _np.uint8) for k in rk]
    nr = len(rk) - 1
    s = _np.frombuffer(data, _np.uint8).reshape(-1, 16) ^ rks[nr]
    for rnd in range(nr - 1, 0, -1):
        s = sb[s[:, ish]] ^ rks[rnd]
        v = s.reshape(-1, 4, 4)
        a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
        out = _np.empty_like(v)
        out[:, :, 0] = me[a0] ^ mb[a1] ^ md[a2] ^ m9[a3]
        out[:, :, 1] = m9[a0] ^ me[a1] ^ mb[a2] ^ md[a3]
        out[:, :, 2] = md[a0] ^ m9[a1] ^ me[a2] ^ mb[a3]
        out[:, :, 3] = mb[a0] ^ md[a1] ^ m9[a2] ^ me[a3]
        s = out.reshape(-1, 16)
    s = sb[s[:, ish]] ^ rks[0]
    return s.tobytes()


# --- public modes -------------------------------------------------------------


def encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB encrypt (used for the V5 /Perms entry)."""
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _py_encrypt_block(key_schedule(key), block)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt; PKCS#7-pads unless ``pad=False`` (then len(data)
    must already be block-aligned). Scalar — encryption is never bulk here."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC input must be block-aligned")
    rk = key_schedule(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _py_encrypt_block(
            rk, bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        )
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; strips and validates PKCS#7 padding unless
    ``unpad=False``. numpy ECB lane for bulk input, scalar otherwise."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    if len(data) % 16 or (unpad and not data):
        raise ValueError("CBC ciphertext must be non-empty block-aligned")
    rk = key_schedule(key)
    if _np is not None and len(data) >= 64:
        ecb = _np_ecb_decrypt(rk, data)
        chain = iv + data[:-16]
        plain = (
            _np.frombuffer(ecb, _np.uint8) ^ _np.frombuffer(chain, _np.uint8)
        ).tobytes()
    else:
        ecb = _py_ecb_decrypt(rk, data)
        chain = iv + data[:-16]
        plain = bytes(x ^ y for x, y in zip(ecb, chain))
    if not unpad:
        return plain
    n = plain[-1]
    if not 1 <= n <= 16 or plain[-n:] != bytes([n]) * n:
        raise ValueError("bad PKCS#7 padding")
    return plain[:-n]
