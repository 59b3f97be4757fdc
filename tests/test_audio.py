"""Audio-leg operators: WAV codec round-trip, exact-integer frame stats,
and energy-VAD segmentation (hand-computed ground truth + plan shape)."""

from __future__ import annotations

import numpy as np
import pytest

from slower_whisper_spark.operators.audio import (
    decode_wav_pcm,
    encode_wav_pcm16,
    frame_stats_int,
    vad_segments,
    wav_frame_stats,
)


def test_wav_roundtrip_mono16():
    s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    rate, out = decode_wav_pcm(encode_wav_pcm16(s, 16000))
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_roundtrip_8bit_is_256_grid():
    s = np.array([0, 256, -256, 12800, -32768], dtype=np.int16)
    rate, out = decode_wav_pcm(encode_wav_pcm16(s, 8000, bits=8))
    assert rate == 8000
    assert np.array_equal(out, s)  # already on the grid → exact
    # off-grid values quantize by floor(v/256)*256
    s2 = np.array([300, -300], dtype=np.int16)
    _, out2 = decode_wav_pcm(encode_wav_pcm16(s2, 8000, bits=8))
    assert out2.tolist() == [256, -512]


def test_wav_stereo_downmix_floor_mean():
    left = np.array([100, -101, 7], dtype=np.int16)
    right = np.array([200, -100, 8], dtype=np.int16)
    inter = np.empty(6, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    _, out = decode_wav_pcm(encode_wav_pcm16(inter, 16000, channels=2))
    # floor division: (-101 + -100)//2 = -101 (floor, not trunc)
    assert out.tolist() == [150, -101, 7]


def test_wav_rejects_non_pcm_and_truncated():
    assert decode_wav_pcm(b"") is None
    assert decode_wav_pcm(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt/data
    good = encode_wav_pcm16(np.zeros(10, dtype=np.int16), 16000)
    bad = good.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1)  # float tag
    assert decode_wav_pcm(bad) is None


def test_frame_stats_exact_integers():
    s = np.array([3, -4, 0, 5, -1, 2], dtype=np.int16)
    out = frame_stats_int(s, 3)  # two frames, no partial
    # frame 0: [3,-4,0] sumsq=25, signbit seq F,T,F → 2 flips, peak 4
    # frame 1: [5,-1,2] sumsq=30, F,T,F → 2 flips, peak 5
    assert out == [(3, 25, 2, 4), (3, 30, 2, 5)]
    # trailing partial dropped
    assert frame_stats_int(s[:5], 3) == [(3, 25, 2, 4)]
    assert frame_stats_int(s[:2], 3) == []


def test_vad_segments_hand_case(spark):
    # frames: active A=sumsq>=thr*n with thr=100, n=4 → threshold sumsq 400
    # clip 1: A A . A A A .  → segments [0,1] and [3,5]
    # clip 2: all inactive   → no segments
    rows = [
        (1, 8000, 0, 4, 500, 3, 20),
        (1, 8000, 1, 4, 900, 1, 30),
        (1, 8000, 2, 4, 10, 0, 2),
        (1, 8000, 3, 4, 400, 2, 21),
        (1, 8000, 4, 4, 401, 2, 22),
        (1, 8000, 5, 4, 1000, 5, 23),
        (1, 8000, 6, 4, 399, 9, 19),
        (2, 8000, 0, 4, 0, 0, 0),
        (2, 8000, 1, 4, 399, 1, 9),
    ]
    frames = spark.createDataFrame(
        rows, "audio_id long, rate long, frame_idx long, n long, "
        "sumsq long, zero_cross long, peak long"
    )
    out = vad_segments(frames, ms_threshold=100).orderBy("audio_id", "seg_id")
    got = [r.asDict() for r in out.collect()]
    assert [g["audio_id"] for g in got] == [1, 1]
    s1, s2 = got
    assert (s1["start_frame"], s1["end_frame"], s1["n_frames"]) == (0, 1, 2)
    assert s1["sum_sumsq"] == 1400 and s1["peak"] == 30 and s1["sum_zero_cross"] == 4
    assert s1["start_sec"] == 0.0 and s1["end_sec"] == pytest.approx(8 / 8000)
    assert (s2["start_frame"], s2["end_frame"], s2["n_frames"]) == (3, 5, 3)
    assert s2["start_sec"] == pytest.approx(12 / 8000)
    assert s2["end_sec"] == pytest.approx(24 / 8000)


def test_wav_frame_stats_distributed_matches_raw(spark):
    rng = np.random.RandomState(42)
    s = (rng.randint(-3000, 3000, size=4 * 400 + 57)).astype(np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav_pcm16(s, 16000)))], "audio_id long, wav binary"
    ).repartition(3)
    got = (
        wav_frame_stats(df, frame_len=400)
        .orderBy("frame_idx")
        .collect()
    )
    exp = frame_stats_int(s, 400)
    assert len(got) == len(exp) == 4
    for row, (n, sumsq, zc, peak) in zip(got, exp):
        assert (row.n, row.sumsq, row.zero_cross, row.peak) == (n, sumsq, zc, peak)
        assert row.rate == 16000
    # undecodable payload yields zero rows, not a failure
    junk = spark.createDataFrame([(1, bytearray(b"nope"))], "audio_id long, wav binary")
    assert wav_frame_stats(junk).count() == 0


def test_vad_single_shuffle(spark):
    """The window + groupBy share the audio_id exchange: exactly one
    shuffle between the decode UDF and the segment output."""
    from slower_whisper_spark.plans import explain_str

    frames = spark.createDataFrame(
        [(1, 8000, 0, 4, 500, 3, 20)],
        "audio_id long, rate long, frame_idx long, n long, "
        "sumsq long, zero_cross long, peak long",
    )
    plan = explain_str(vad_segments(frames, ms_threshold=100))
    # hashpartitioning on audio_id appears; row_number windows reuse it
    assert plan.lower().count("exchange hashpartitioning") <= 1
