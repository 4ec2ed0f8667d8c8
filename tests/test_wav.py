"""WAV kernel (kernels/wav.py): header bytes pinned against the RIFF spec
by hand, round-trips, chunk-walk tolerance, stereo/8-bit energies, and
the stdlib `wave` module as an independent cross-check."""

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from deepseek_ocr_spark.kernels import wav


def test_header_bytes_pinned():
    data = wav.encode_wav_pcm16(np.array([0, 1000, -1000], dtype="<i2"), 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt " and struct.unpack("<I", data[16:20])[0] == 16
    fmt, nch, rate, br, ba, bits = struct.unpack("<HHIIHH", data[20:36])
    assert (fmt, nch, rate, bits) == (1, 1, 8000, 16)
    assert (br, ba) == (16000, 2)
    assert data[36:40] == b"data" and struct.unpack("<I", data[40:44])[0] == 6
    assert data[44:] == np.array([0, 1000, -1000], dtype="<i2").tobytes()


def test_roundtrip_and_stdlib_cross_check():
    rng = np.random.RandomState(9)
    samples = rng.randint(-32768, 32767, 500).astype("<i2")
    data = wav.encode_wav_pcm16(samples, 16000)
    nch, rate, bits, n_frames, pcm = wav.parse_wav(data)
    assert (nch, rate, bits, n_frames) == (1, 16000, 16, 500)
    assert pcm == samples.tobytes()
    # independent reader: the stdlib wave module agrees
    with stdlib_wave.open(io.BytesIO(data)) as r:
        assert (r.getnchannels(), r.getframerate(), r.getsampwidth(),
                r.getnframes()) == (1, 16000, 2, 500)
        assert r.readframes(500) == pcm


def test_parse_skips_foreign_chunks():
    body = wav.encode_wav_pcm16(np.array([5, -5], dtype="<i2"), 8000)
    # splice a LIST chunk (odd size → word-aligned padding) between fmt and data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = body[:36] + extra + body[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    nch, rate, bits, n, pcm = wav.parse_wav(spliced)
    assert (nch, n) == (1, 2) and pcm == body[44:]


def test_parse_rejects_bad_input():
    ok = wav.encode_wav_pcm16(np.zeros(4, dtype="<i2"), 8000)
    for bad in (b"RIFFxxxx", b"nope", ok[:30],
                ok.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1)):
        with pytest.raises(ValueError):
            wav.parse_wav(bad)


def test_frame_energies_mono_partial_window():
    s = np.array([1, -2, 3, -4, 5], dtype="<i2")
    e = wav.frame_energies(s.tobytes(), 16, 1, 2)
    assert e == [3, 7, 5]  # |1|+|−2|, |3|+|−4|, final partial |5|


def test_frame_energies_stereo_pools_channels():
    # frames: (1,-1), (2,2) → per-frame mags 2, 4
    s = np.array([1, -1, 2, 2], dtype="<i2")
    e = wav.frame_energies(s.tobytes(), 16, 2, 1)
    assert e == [2, 4]


def test_frame_energies_8bit_centered():
    pcm = bytes([128, 138, 118])  # offsets 0, +10, -10
    assert wav.frame_energies(pcm, 8, 1, 3) == [20]


def test_operator_closed_form_matches_kernel():
    """The SQL oracle's closed form equals the real build→parse→extract
    composition for sample texts (including a unicode one — length() is
    CHARACTERS on both sides, while the md5 hashes the UTF-8 bytes)."""
    from deepseek_ocr_spark.operators.multimodal import (
        AUDIO_FRAME, AUDIO_RATE, _synth_samples,
    )
    import hashlib

    for text in ("hello world", "a", "ünïcødé text 你好", "x" * 40):
        samples = _synth_samples(text)
        reps = 2 + len(text) % 7
        assert len(samples) == 32 * reps
        data = wav.encode_wav_pcm16(samples, AUDIO_RATE)
        nch, rate, bits, n, pcm = wav.parse_wav(data)
        assert n == 32 * reps
        h = hashlib.md5(text.encode()).hexdigest()
        e32 = sum(abs(ord(c) * 256 - 32768) for c in h)
        expect = [2 * e32] * (reps // 2) + ([e32] if reps % 2 else [])
        assert wav.frame_energies(pcm, bits, nch, AUDIO_FRAME) == expect
