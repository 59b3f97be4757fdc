"""Streaming energy-VAD: PARTIAL→FINALIZED lifecycle + exact parity with
the batch twin (which is driver-checked against the DuckDB oracle — the
parity pins the streaming operator transitively)."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest

FRAME_SCHEMA = (
    "audio_id long, rate long, frame_idx long, n long, sumsq long, "
    "zero_cross long, peak long, frame_ts timestamp"
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write(spark, src, rows):
    spark.createDataFrame(rows, FRAME_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.05)  # distinct mod-times: deterministic file order


def _run_stream(spark, tmp_path, src, name, ms_threshold=100):
    from slower_whisper_spark.streaming.vad import vad_segments_stream

    stream = (
        spark.readStream.schema(FRAME_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = vad_segments_stream(
        stream, ms_threshold=ms_threshold, watermark="1 second", finalize_after_sec=2.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _best(rows):
    """Sink merge rule: per segment_key keep FINALIZED over PARTIAL, then
    max n_frames (the merge_turn_updates contract)."""
    by = {}
    for r in rows:
        cur = by.get(r.segment_key)
        better = cur is None or (
            (r.status == "FINALIZED") > (cur.status == "FINALIZED")
            or (r.status == cur.status and r.n_frames > cur.n_frames)
        )
        if better:
            by[r.segment_key] = r
    return by


def frame_row(aid, idx, active, ts_off, n=4, rate=8000):
    # thr=100, n=4 → active needs sumsq >= 400
    return (
        aid, rate, idx, n,
        900 + idx if active else 10,
        2, 30 + idx,
        T0 + dt.timedelta(seconds=ts_off),
    )


def test_vad_stream_partial_then_finalized(tmp_path, spark):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # batch 0: frames 0-2 active → PARTIAL island [0,2]
    _write(spark, src, [frame_row(1, i, True, i) for i in range(3)])
    # batch 1: frame 3 extends; frame 10 (gap) finalizes [0,3], opens [10]
    _write(spark, src, [frame_row(1, 3, True, 3), frame_row(1, 10, True, 10)])
    # batch 2: far-future inactive sentinel advances the watermark → the
    # trailing island [10] finalizes via event-time timeout
    _write(spark, src, [frame_row(999, 0, False, 5000)])

    rows = _run_stream(spark, tmp_path, src, "vad_tbl1")
    statuses = {(r.segment_key, r.status) for r in rows}
    assert ("1-0", "PARTIAL") in statuses  # island open after batch 0
    assert ("1-0", "FINALIZED") in statuses  # closed by the in-data gap
    assert ("1-10", "FINALIZED") in statuses  # closed by timeout
    best = _best(rows)
    f0 = best["1-0"]
    assert (f0.start_frame, f0.end_frame, f0.n_frames) == (0, 3, 4)
    assert f0.n_samples == 16 and f0.peak == 33
    assert f0.start_sec == 0.0 and f0.end_sec == pytest.approx(16 / 8000)
    # silence never reaches the state store: no rows for the sentinel key
    assert all(r.audio_id != 999 for r in rows)


def test_vad_stream_stale_duplicate_ignored(tmp_path, spark):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    _write(spark, src, [frame_row(1, i, True, i) for i in range(3)])
    # duplicate of frame 1 redelivered within the watermark: idx <= end → no-op
    _write(spark, src, [frame_row(1, 1, True, 3.5), frame_row(1, 3, True, 3)])
    _write(spark, src, [frame_row(999, 0, False, 5000)])
    rows = _run_stream(spark, tmp_path, src, "vad_tbl2")
    best = _best(rows)
    assert set(best) == {"1-0"}
    f = best["1-0"]
    assert f.status == "FINALIZED"
    assert (f.start_frame, f.end_frame, f.n_frames, f.n_samples) == (0, 3, 4, 16)


def test_vad_stream_batch_twin_parity(tmp_path, spark):
    """The streaming operator over the WAV-fixture frame stream must emit
    exactly the batch vad_segments rows (after the sink merge rule)."""
    import __spark_entry__ as em
    from slower_whisper_spark.operators.audio import vad_segments, wav_frame_stats

    clips = em._wav_fixture()[:6]
    df = spark.createDataFrame(
        [(r["audio_id"], bytearray(r["wav"])) for r in clips],
        "audio_id long, wav binary",
    )
    frames = wav_frame_stats(df, frame_len=em._WAV_FRAME_LEN)
    batch = vad_segments(frames, ms_threshold=em._WAV_MS_THRESHOLD).collect()

    fpdf = frames.toPandas().sort_values(["audio_id", "frame_idx"])
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # three micro-batches split by frame index so islands span batches;
    # frame_ts = clip-local end time (seconds scale keeps timeouts simple)
    splits = [(0, 20), (20, 45), (45, 10**9)]
    for lo, hi in splits:
        part = fpdf[(fpdf.frame_idx >= lo) & (fpdf.frame_idx < hi)]
        rows = [
            (
                int(r.audio_id), int(r.rate), int(r.frame_idx), int(r.n),
                int(r.sumsq), int(r.zero_cross), int(r.peak),
                T0 + dt.timedelta(seconds=float(r.frame_idx) * 0.05),
            )
            for r in part.itertuples()
        ]
        _write(spark, src, rows)
    _write(spark, src, [frame_row(999, 0, False, 50000)])

    got = _best(
        _run_stream(
            spark, tmp_path, src, "vad_tbl3", ms_threshold=em._WAV_MS_THRESHOLD
        )
    )
    assert all(r.status == "FINALIZED" for r in got.values())

    def key(aid, start):
        return f"{aid}-{start}"

    assert set(got) == {key(b.audio_id, b.start_frame) for b in batch}
    for b in batch:
        g = got[key(b.audio_id, b.start_frame)]
        assert (
            g.end_frame, g.n_frames, g.n_samples, g.sum_sumsq,
            g.sum_zero_cross, g.peak,
        ) == (
            b.end_frame, b.n_frames, b.n_samples, b.sum_sumsq,
            b.sum_zero_cross, b.peak,
        )
        assert g.start_sec == b.start_sec and g.end_sec == b.end_sec
