"""Streaming energy-VAD: the live-audio twin of
``operators.audio.vad_segments`` — the engine analog of the reference's
live transcription mode, where segments stream out as PARTIAL rows and are
superseded by FINALIZED rows with the same id (ref:
transcription/schemas/stream_event.schema.json:308-393; streaming_ws.py
replay/finalize protocol).

Design:

* The activity threshold (``sumsq >= ms_threshold * n``) is applied
  INSIDE the stateful function as a vectorized pandas mask — deliberately
  NOT as a plan-side filter: Catalyst pushes a deterministic filter below
  the ``EventTimeWatermark`` node, and the silent frames it would remove
  are precisely the events that must advance the watermark after an
  utterance ends (a mic stream's trailing silence is what finalizes its
  last segment). Silent frames still never enter the STATE store — only
  the Arrow batch scan sees them.
* Per audio key the state is ONE fixed-width tuple for the open island
  (bounded state, same argument as turn_lifecycle: O(open segments), not
  O(keys seen)).
* Island semantics are identical to the batch twin by construction: an
  island breaks exactly when the active-frame index sequence has a gap —
  whether the missing frames were silent or lost in transit (batch's
  ``frame_idx − row_number`` grouping makes the same call). Segment ids
  are ``{audio_id}-{start_frame}`` — derived from event data, so a
  replayed duplicate maps onto the same id (idempotent overwrite-by-id
  sinks), and the batch twin's rows can be keyed identically for parity.
* Finalization: an in-data gap finalizes immediately; a trailing island
  finalizes via event-time state timeout once the watermark passes
  ``frame_ts + finalize_after``. Frames older than the current watermark
  are dropped inside the function (stateful ops receive unfiltered
  input), so redeliveries past the watermark cannot re-open an island.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


VAD_STREAM_SCHEMA = (
    "audio_id long, segment_key string, status string, "
    "start_frame long, end_frame long, n_frames long, n_samples long, "
    "sum_sumsq long, sum_zero_cross long, peak long, "
    "start_sec double, end_sec double"
)


def vad_segments_stream(
    frame_stream: DataFrame,
    *,
    ms_threshold: int = 1_000_000,
    ts_col: str = "frame_ts",
    watermark: str = "10 seconds",
    finalize_after_sec: float = 2.0,
) -> DataFrame:
    """Stateful PARTIAL→FINALIZED VAD over a stream of frame-stat rows
    (schema of ``wav_frame_stats`` + an event-time ``frame_ts``).

    Output rows carry the same exact-integer aggregates as the batch twin;
    a PARTIAL row for an open island is superseded by the FINALIZED row
    with the same ``segment_key`` (sinks merge like ``merge_turn_updates``:
    keep max n_frames per key, FINALIZED over PARTIAL on ties)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = (
        "start long, end long, nf long, ns long, ssq long, szc long, "
        "pk long, rate long, fn long, last_ts double"
    )
    thr = int(ms_threshold)

    def emit(k, st, status):
        start, end, nf, ns, ssq, szc, pk, rate, fn = st
        return {
            "audio_id": int(k),
            "segment_key": f"{int(k)}-{int(start)}",
            "status": status,
            "start_frame": int(start),
            "end_frame": int(end),
            "n_frames": int(nf),
            "n_samples": int(ns),
            "sum_sumsq": int(ssq),
            "sum_zero_cross": int(szc),
            "peak": int(pk),
            "start_sec": float(start * fn) / rate,
            "end_sec": float(end * fn + fn) / rate,
        }

    def fn(key, pdfs, state):
        k = key[0]
        if state.hasTimedOut:
            *st, _last_ts = state.get
            state.remove()
            yield pd.DataFrame([emit(k, st, "FINALIZED")])
            return
        if state.exists:
            *st, last_ts = state.get
        else:
            st, last_ts = None, None
        wm = state.getCurrentWatermarkMs() / 1000.0
        frames = []
        for pdf in pdfs:
            ts = pdf[ts_col]
            if str(ts.dtype).startswith("datetime"):
                ts = ts.astype("int64") / 1e9
            # vectorized: watermark drop + activity threshold; the silent
            # rows advance event time upstream but never touch state
            keep = (ts.values >= wm) & (
                pdf["sumsq"].values >= thr * pdf["n"].values
            )
            sub = pdf.loc[keep]
            frames.extend(
                zip(
                    sub["frame_idx"].astype(int),
                    sub["n"].astype(int),
                    sub["sumsq"].astype(int),
                    sub["zero_cross"].astype(int),
                    sub["peak"].astype(int),
                    sub["rate"].astype(int),
                    ts.values[keep],
                )
            )
        frames.sort(key=lambda f: f[0])
        rows = []
        for idx, n, ssq_f, zc, pk_f, rate, t in frames:
            if st is None:
                st = [idx, idx, 1, n, ssq_f, zc, pk_f, rate, n]
            elif idx == st[1] + 1:
                st[1] = idx
                st[2] += 1
                st[3] += n
                st[4] += ssq_f
                st[5] += zc
                st[6] = max(st[6], pk_f)
            elif idx > st[1] + 1:
                rows.append(emit(k, st, "FINALIZED"))
                st = [idx, idx, 1, n, ssq_f, zc, pk_f, rate, n]
            # idx <= end: stale duplicate → ignore
            last_ts = t if last_ts is None else max(last_ts, t)
        if st is not None:
            rows.append(emit(k, st, "PARTIAL"))
            state.update((*[int(v) for v in st], float(last_ts)))
            state.setTimeoutTimestamp(int((last_ts + finalize_after_sec) * 1000))
        yield pd.DataFrame(rows)

    return frame_stream.withWatermark(ts_col, watermark).groupBy(
        "audio_id"
    ).applyInPandasWithState(
        fn,
        VAD_STREAM_SCHEMA,
        state_schema,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )
