"""MP4 box-walker (kernels/mp4.py): header bytes pinned against the
ISO-BMFF layout by hand, writer/parser round-trips, 64-bit largesize,
version-1 mvhd, hostile-input mutation fuzz, and the video_meta oracle
closed form."""

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.mp4 import build_mp4, parse_mp4_meta


def test_box_layout_pinned():
    data = build_mp4(320, 180, 2500)
    # ftyp: size, 'ftyp', brand
    size, btype = struct.unpack(">I4s", data[:8])
    assert btype == b"ftyp" and data[8:12] == b"isom"
    # next top-level box is moov; mvhd v0 carries timescale at body+12
    moov_at = size
    assert data[moov_at + 4 : moov_at + 8] == b"moov"
    assert data[moov_at + 12 : moov_at + 16] == b"mvhd"
    body = moov_at + 16
    ts, dur = struct.unpack(">II", data[body + 12 : body + 20])
    assert (ts, dur) == (1000, 2500)


def test_roundtrip_variants():
    for w, h, dur, naud in [(320, 180, 2500, 0), (1920, 1080, 60000, 2),
                            (16, 16, 1, 1)]:
        m = parse_mp4_meta(build_mp4(w, h, dur, n_audio_tracks=naud))
        assert (m["width"], m["height"]) == (w, h)
        assert m["duration_ms"] == dur and m["n_tracks"] == 1 + naud


def test_mvhd_version1_and_largesize():
    """Hand-build a v1 mvhd (64-bit duration) and a largesize moov."""
    mvhd = bytes([1, 0, 0, 0]) + bytes(16) + struct.pack(">IQ", 90000, 450000)
    mvhd += bytes(80)
    mvhd_box = struct.pack(">I4s", len(mvhd) + 8, b"mvhd") + mvhd
    # moov with size=1 + 64-bit largesize
    moov_body = mvhd_box
    moov = struct.pack(">I4s", 1, b"moov") + struct.pack(
        ">Q", len(moov_body) + 16
    ) + moov_body
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"mp42" + bytes(4)
    m = parse_mp4_meta(ftyp + moov)
    assert m["brand"] == "mp42"
    assert m["timescale"] == 90000 and m["duration_ms"] == 5000
    assert m["n_tracks"] == 0 and m["width"] == 0


def test_corrupt_raises_value_error_only():
    base = build_mp4(320, 180, 2500, n_audio_tracks=1)
    rng = np.random.RandomState(4)
    for bad in (b"", b"abc", b"\x00" * 20, base[:20], base[8:]):
        with pytest.raises(ValueError):
            parse_mp4_meta(bad)
    for trial in range(400):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.randint(1, 5)):
                data[rng.randint(0, len(data))] = rng.randint(0, 256)
        elif mode == 1:
            data = data[: rng.randint(1, len(data))]
        else:
            at = rng.randint(0, len(data))
            data = data[:at] + bytes(rng.randint(0, 256, 16, dtype=np.uint8).tolist()) + data[at:]
        try:
            parse_mp4_meta(bytes(data))
        except ValueError:
            pass  # only allowed failure


def test_video_meta_closed_form():
    from deepseek_ocr_spark.operators.multimodal import video_meta_sql  # noqa: F401
    from deepseek_ocr_spark.kernels import mp4

    for text in ("hello", "", "x" * 123, "ünïcødé"):
        n = len(text)
        m = mp4.parse_mp4_meta(mp4.build_mp4(
            width=160 + (n % 7) * 16, height=90 + (n % 5) * 18,
            duration=1000 + 40 * (n % 50), n_audio_tracks=n % 3,
        ))
        assert m["duration_ms"] == 1000 + 40 * (n % 50)
        assert m["n_tracks"] == 1 + n % 3
        assert m["width"] == 160 + (n % 7) * 16
        assert m["height"] == 90 + (n % 5) * 18
