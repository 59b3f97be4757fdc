"""Audio-leg multimodal operators: WAV PCM decode -> frame-level features
-> energy-VAD segmentation.

This is the engine analog of the reference's core pipeline shape — audio in,
timed segments out (ref: transcription/pipeline.py: per-file audio ->
``Segment(id, start, end, ...)`` rows; ref: transcription/audio_enrichment.py
+ prosody.py: frame-level energy/rate features over PCM). The ASR model
itself is out of scope (SURVEY §7 non-goal: GPU ASR engines); what is kept
is every part a data engine owns: container parse, sample framing, feature
extraction, and the segmentation relational algebra.

Design for scale:

* The only Python stage is the codec boundary (`wav_frame_stats`): an
  Arrow-batched ``mapInPandas`` over the opaque binary column, numpy per
  payload, emitting **exact-integer** per-frame statistics (sum of squares,
  zero crossings, peak as int64). No floats cross the UDF boundary, so the
  downstream math is bit-portable across Spark / DuckDB / Python.
* Everything after the codec is JVM-side DataFrame algebra:
  VAD thresholding is an integer comparison, segment formation is the
  gaps-and-islands pattern (frame_idx − row_number), and the derived
  second-offsets are single exact int→double divisions. At 100 TB the
  shuffle is one exchange on the audio key for the window functions —
  identical shape to sessionize (operators/sessionize.py).
* Frames are non-overlapping by default (hop == frame_len). A trailing
  partial frame is DROPPED (documented) so every frame has the same sample
  count and the threshold comparison `sumsq >= ms_threshold * n` stays in
  integers.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WAV_FRAME_SCHEMA = (
    "audio_id long, rate long, frame_idx long, n long, "
    "sumsq long, zero_cross long, peak long"
)


def decode_wav_pcm(b: bytes) -> tuple[int, np.ndarray] | None:
    """Parse a RIFF/WAVE payload into (sample_rate, mono int16 samples).

    Supported: PCM (format tag 1), 16-bit signed or 8-bit unsigned, any
    channel count (channels are downmixed by floor-division mean, exact in
    integers). Returns None for non-PCM / truncated containers — callers
    emit a metadata-only row rather than failing the partition.
    """
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i = 12
        rate = bits = channels = fmt_tag = None
        data = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csz = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                fmt_tag, channels, rate, _bps, _ba, bits = struct.unpack(
                    "<HHIIHH", b[i + 8 : i + 24]
                )
            elif cid == b"data":
                data = b[i + 8 : i + 8 + csz]
            i += 8 + csz + (csz & 1)
        if fmt_tag != 1 or data is None or not rate or not channels:
            return None
        if bits == 16:
            s = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        elif bits == 8:
            # 8-bit WAV is unsigned; widen to the int16 grid
            s = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
        else:
            return None
        if channels > 1:
            s = s[: len(s) // channels * channels].reshape(-1, channels)
            # exact integer downmix: floor of the channel mean
            s = (s.astype(np.int64).sum(axis=1) // channels).astype(np.int16)
        return int(rate), s
    except (struct.error, IndexError):
        return None


def frame_stats_int(samples: np.ndarray, frame_len: int) -> list[tuple[int, int, int, int]]:
    """Exact-integer per-frame stats over int16 samples: for each complete
    frame (trailing partial dropped) return (n, sumsq, zero_cross, peak).

    zero_cross counts sign flips between adjacent samples WITHIN the frame
    (sign = signbit: 0 is positive); peak = max |s|. All values fit int64:
    sumsq <= n * 32768^2. This same function computes the encode-side
    oracle literals in the driver fixture, so the Spark row proves
    WAV-encode -> decode -> framing round-trip fidelity.
    """
    n_frames = len(samples) // frame_len
    if n_frames == 0:
        return []
    x = samples[: n_frames * frame_len].astype(np.int64).reshape(n_frames, frame_len)
    sumsq = (x * x).sum(axis=1)
    sb = np.signbit(x)
    zc = (sb[:, 1:] != sb[:, :-1]).sum(axis=1)
    peak = np.abs(x).max(axis=1)
    return [
        (frame_len, int(sumsq[k]), int(zc[k]), int(peak[k])) for k in range(n_frames)
    ]


def wav_frame_stats(
    df: DataFrame,
    *,
    key_col: str = "audio_id",
    binary_col: str = "wav",
    frame_len: int = 400,
) -> DataFrame:
    """Distributed WAV decode -> per-frame integer feature rows.

    mapInPandas over (key, binary): one Arrow batch in, one frame-stats
    frame out; numpy decode per payload, nothing collected on the driver.
    Undecodable payloads yield zero rows (callers can anti-join to find
    them). Column pruning keeps the scan to the two needed columns.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["audio_id", "rate", "frame_idx", "n", "sumsq", "zero_cross", "peak"]
        for pdf in batches:
            out = []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                dec = decode_wav_pcm(bytes(payload) if payload is not None else b"")
                if dec is None:
                    continue
                rate, samples = dec
                for idx, (n, sumsq, zc, peak) in enumerate(
                    frame_stats_int(samples, frame_len)
                ):
                    out.append((int(key), rate, idx, n, sumsq, zc, peak))
            yield pd.DataFrame(out, columns=cols)

    return df.select(key_col, binary_col).mapInPandas(
        decode_batches, schema=WAV_FRAME_SCHEMA
    )


def vad_segments(
    frames: DataFrame,
    *,
    ms_threshold: int = 1_000_000,
) -> DataFrame:
    """Energy-VAD segmentation over frame stats: JVM-side gaps-and-islands.

    A frame is ACTIVE iff ``sumsq >= ms_threshold * n`` (mean-square
    energy threshold kept as one int64 comparison — no float drift between
    engines). Runs of consecutive active frames become segments via the
    classic islands key (frame_idx − row_number), then one groupBy emits
    per-segment bounds + exact energy sums; start/end seconds are single
    int→double divisions. Output mirrors the reference's Segment rows
    (ref: transcription/models.py:524-579 — id, start, end + features).

    One shuffle on the audio key (window + groupBy share it); at scale the
    frame table never sits on the driver.
    """
    w = Window.partitionBy("audio_id").orderBy("frame_idx")
    active = frames.where(F.col("sumsq") >= F.lit(int(ms_threshold)) * F.col("n"))
    islands = active.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    seg = (
        islands.groupBy("audio_id", "grp")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("n").alias("n_samples"),
            F.sum("sumsq").alias("sum_sumsq"),
            F.sum("zero_cross").alias("sum_zero_cross"),
            F.max("peak").alias("peak"),
            F.first("rate").alias("rate"),
            F.first("n").alias("frame_n"),
        )
        .withColumn(
            "seg_id",
            F.row_number().over(
                Window.partitionBy("audio_id").orderBy("start_frame")
            ),
        )
        .withColumn(
            "start_sec",
            (F.col("start_frame") * F.col("frame_n")).cast("double") / F.col("rate"),
        )
        .withColumn(
            "end_sec",
            (F.col("end_frame") * F.col("frame_n") + F.col("frame_n")).cast("double")
            / F.col("rate"),
        )
        .drop("grp", "frame_n")
    )
    return seg.select(
        "audio_id",
        "seg_id",
        "start_frame",
        "end_frame",
        "n_frames",
        "n_samples",
        "sum_sumsq",
        "sum_zero_cross",
        "peak",
        "start_sec",
        "end_sec",
    )


# --------------------------------------------------------------------- #
# WAV encoder (fixture-side; the operators above never call it)
# --------------------------------------------------------------------- #
def encode_wav_pcm16(
    samples: np.ndarray, rate: int, *, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal RIFF/WAVE writer for the deterministic test corpus.

    ``samples`` is int16 (interleaved when channels > 1) or, for bits=8,
    values already on the int16 grid that quantize back to uint8 exactly
    (multiples of 256 shifted by -32768 .. i.e. encode is the inverse of
    decode_wav_pcm's widening).
    """
    if bits == 16:
        raw = samples.astype("<i2").tobytes()
        bps = 2
    elif bits == 8:
        raw = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        bps = 1
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = bps * channels
    byte_rate = rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block_align, bits)
    data_sz = len(raw)
    riff_sz = 4 + (8 + len(fmt)) + (8 + data_sz + (data_sz & 1))
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", riff_sz) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", data_sz) + raw
    if data_sz & 1:
        out += b"\x00"
    return bytes(out)
