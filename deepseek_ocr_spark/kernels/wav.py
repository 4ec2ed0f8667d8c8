"""WAV (RIFF PCM) codec — stdlib byte parsing, the audio leg of the
multimodal binary-column matrix (images: pixels.py/jpeg.py/gif.py; audio:
here; video: container metadata + frame plan).

Real encode (PCM16 mono/stereo) and real parse (RIFF walk tolerant of
extra chunks, fmt validation) plus integer frame-energy extraction — the
feature-extraction shape a real pipeline runs before an audio encoder.
Energies are INTEGER sums of |sample| so downstream oracles compare
exactly (no float summation order concerns)."""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(samples: np.ndarray, rate: int, n_channels: int = 1) -> bytes:
    """int16 samples (frame-major interleaved for stereo) → WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = rate * n_channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, n_channels, rate, byte_rate, n_channels * 2, 16,
        b"data", len(data),
    )
    return hdr + data


def parse_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """(n_channels, sample_rate, bits, n_frames, pcm_bytes) — RIFF chunk
    walk; unknown chunks (LIST, fact, …) are skipped; ValueError on
    non-PCM or truncation."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"non-PCM WAV (format {audio_fmt})")
            fmt = (nch, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    nch, rate, bits = fmt
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    bytes_per_frame = nch * bits // 8
    if bytes_per_frame == 0 or len(pcm) % bytes_per_frame:
        raise ValueError("PCM length not frame-aligned")
    return nch, rate, bits, len(pcm) // bytes_per_frame, pcm


def frame_energies(pcm: bytes, bits: int, n_channels: int, frame: int) -> list[int]:
    """Integer per-frame energy: sum of |sample| over each window of
    ``frame`` sample-frames (all channels pooled); the final partial
    window counts as a frame.  8-bit WAV is unsigned (centered at 128)."""
    if bits == 16:
        s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    else:
        s = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64) - 128
    if n_channels > 1:
        s = s.reshape(-1, n_channels)
    mags = np.abs(s).reshape(-1) if n_channels == 1 else np.abs(s).sum(axis=1)
    out = []
    for i in range(0, len(mags), frame):
        out.append(int(mags[i : i + frame].sum()))
    return out
