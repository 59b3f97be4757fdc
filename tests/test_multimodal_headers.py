"""Real container-header decoding (decoder='headers'): the test MEDIA FILES
are constructed byte-for-byte valid in pure python (PNG via zlib, JPEG with
a SOF0 segment, GIF, 24-bit BMP, PCM WAV), so the parsed width/height/
duration assertions are against ground truth, not against the parser."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from slower_whisper_spark.operators.multimodal import (
    _headers_feature,
    decode_media,
    parse_media_header,
)


def make_png(w: int, h: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))  # filter-0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    # standard 16-byte JFIF APP0: id(5) + version(2) + units(1) + density(4) + thumb(2)
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00" + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(w: int, h: int, rgb=(255, 0, 0)) -> bytes:
    row = (bytes(rgb[::-1]) * w) + b"\x00" * ((4 - (3 * w) % 4) % 4)  # BGR + pad
    px = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + px


def make_wav(seconds: float = 0.5, rate: int = 8000, freq: float = 440.0) -> bytes:
    n = int(seconds * rate)
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def test_header_parse_ground_truth():
    png = parse_media_header(make_png(320, 200))
    assert (png["format"], png["width"], png["height"]) == ("png", 320, 200)
    jpg = parse_media_header(make_jpeg(640, 480))
    assert (jpg["format"], jpg["width"], jpg["height"]) == ("jpeg", 640, 480)
    gif = parse_media_header(make_gif(12, 34))
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 12, 34)
    bmp = parse_media_header(make_bmp(5, 7))
    assert (bmp["format"], bmp["width"], bmp["height"]) == ("bmp", 5, 7)
    wav = parse_media_header(make_wav(0.5, rate=8000))
    assert wav["format"] == "wav" and wav["media_type"] == "audio"
    assert wav["duration_sec"] == pytest.approx(0.5, abs=1e-3)
    other = parse_media_header(b"\x00\x01\x02not media")
    assert other["format"] == "bin" and other["n_bytes"] == 12


def test_header_parse_truncated_is_safe():
    for maker in (make_png, make_jpeg, make_gif, make_bmp):
        full = maker(16, 16)
        for cut in (0, 1, 3, 9, len(full) // 2):
            parse_media_header(full[:cut])  # must not raise
    parse_media_header(make_wav(0.1)[:20])


def test_real_features_wav_and_bmp():
    wav = make_wav(0.25, rate=8000, freq=440)
    meta = parse_media_header(wav)
    feat = _headers_feature(wav, meta, 8)
    # 0.5-amplitude sine: RMS ≈ 0.5/sqrt(2), peak ≈ 0.5
    assert feat[0] == pytest.approx(0.3535, abs=0.01)
    assert feat[2] == pytest.approx(0.5, abs=0.01)

    bmp = make_bmp(4, 4, rgb=(255, 0, 0))  # pure red
    meta = parse_media_header(bmp)
    feat = _headers_feature(bmp, meta, 8)
    # stored BGR: mean blue≈pad-skewed low, red channel high; stds near 0
    assert max(feat[:3]) > 0.9


def test_decode_media_headers_on_spark(spark):
    rows = [
        ("u1", make_png(32, 16)),
        ("u2", make_wav(0.5)),
        ("u3", make_bmp(3, 3)),
        ("u4", b"plain bytes"),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = decode_media(df, key_col="url", binary_col="payload", decoder="headers").toPandas()
    by = {r["url"]: r for _, r in out.iterrows()}
    assert by["u1"]["meta"]["width"] == 32 and by["u1"]["meta"]["format"] == "png"
    assert by["u2"]["meta"]["media_type"] == "audio"
    assert abs(by["u2"]["meta"]["duration_sec"] - 0.5) < 1e-3
    assert by["u3"]["meta"]["format"] == "bmp"
    assert by["u4"]["meta"]["format"] == "bin"
    assert all(len(r["feature"]) == 8 for _, r in out.iterrows())
