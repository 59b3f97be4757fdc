"""KLL mergeable quantile sketches: rank-error bounds, merge associativity,
serialization, Spark applyInPandas build, and manifest round-trip
(SURVEY §4.2 'approximate quantiles must be mergeable')."""

from __future__ import annotations

import base64

import numpy as np
import pytest
from pyspark.sql import functions as F

from slower_whisper_spark.functions.kll import KLLSketch, kll_profile, merge_sketch_rows

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
EPS = 0.02  # k=200 → ~1.3% rank error; assert within 2%


def _rank_err(data: np.ndarray, sk: KLLSketch, q: float) -> float:
    est = sk.quantile(q)
    true_rank = np.searchsorted(np.sort(data), est, side="right") / data.size
    return abs(true_rank - q)


def test_kll_rank_error_single_stream():
    rng = np.random.RandomState(0)
    data = np.concatenate([rng.normal(0, 1, 60_000), rng.exponential(5, 40_000)])
    sk = KLLSketch(k=200, seed=1)
    for chunk in np.array_split(data, 37):
        sk.update_batch(chunk)
    assert sk.n == data.size
    for q in QS:
        assert _rank_err(data, sk, q) <= EPS, q
    # bounded memory: total retained items stay ~O(k log(n/k))
    assert sum(b.size for b in sk.levels) < 3000


def test_kll_merge_matches_single_build():
    rng = np.random.RandomState(1)
    parts = [rng.uniform(i, i + 10, 20_000) for i in range(8)]
    data = np.concatenate(parts)
    merged = KLLSketch(k=200, seed=1)
    for p in parts:
        one = KLLSketch(k=200, seed=1)
        one.update_batch(p)
        merged.merge(one)
    assert merged.n == data.size
    for q in QS:
        assert _rank_err(data, merged, q) <= EPS, q


def test_kll_serialize_roundtrip():
    sk = KLLSketch(k=64, seed=9)
    sk.update_batch(np.arange(10_000, dtype=float))
    raw = sk.serialize()
    back = KLLSketch.deserialize(raw)
    assert back.n == sk.n and back.k == sk.k
    assert all(np.array_equal(a, b) for a, b in zip(back.levels, sk.levels))
    assert back.quantile(0.5) == sk.quantile(0.5)


def test_kll_nan_and_empty():
    sk = KLLSketch()
    sk.update_batch([np.nan, np.nan])
    assert sk.n == 0 and np.isnan(sk.quantile(0.5))
    sk.update_batch([1.0])
    assert sk.quantile(0.5) == 1.0


def test_kll_profile_spark_and_manifest_roundtrip(docs_small, tmp_path):
    """Per-partition sketches via applyInPandas → b64 → checkpoint manifest
    → reload → merge ≈ global quantiles within sketch error."""
    from slower_whisper_spark.checkpoint import CheckpointManifest, ManifestEntry

    docs, _, _ = docs_small
    docs = docs.withColumn("text_len", F.length("text"))
    prof = kll_profile(docs, "text_len", partition_col="warc_day", k=200)
    rows = prof.collect()
    assert len(rows) == docs.select("warc_day").distinct().count()
    assert sum(r["n"] for r in rows) == docs.filter(F.col("text_len").isNotNull()).count()

    # manifest round-trip: one entry per partition with the b64 sketch
    m = CheckpointManifest(str(tmp_path / "m"))
    entries = [
        ManifestEntry(
            partition=r["partition"], snapshot_id="s", partition_spec="warc_day",
            rule_hash="h", status="success",
            metrics={"rows": float(r["n"])},
            sketches={"text_len": base64.b64encode(bytes(r["sketch"])).decode()},
            completed_at="t", run_id="r1",
        )
        for r in rows
    ]
    m.append(entries, "r1")

    reloaded = m.load()
    assert all(e.sketches.get("text_len") for e in reloaded)
    merged = merge_sketch_rows(
        [base64.b64decode(e.sketches["text_len"]) for e in reloaded], k=200
    )
    data = np.array(
        [r[0] for r in docs.select("text_len").filter(F.col("text_len").isNotNull()).collect()],
        dtype=float,
    )
    assert merged.n == data.size
    for q in QS:
        assert _rank_err(data, merged, q) <= EPS, q


def test_old_manifest_entries_still_load(tmp_path):
    """Entries written before the sketches field existed must deserialize."""
    import json, os
    from slower_whisper_spark.checkpoint import CheckpointManifest

    d = tmp_path / "m"
    os.makedirs(d)
    legacy = {
        "partition": "p", "snapshot_id": "s", "partition_spec": "d",
        "rule_hash": "h", "status": "success", "metrics": {},
        "completed_at": "t", "run_id": "r",
    }
    with open(d / "0000000000000001-r.jsonl", "w") as f:
        f.write(json.dumps(legacy) + "\n")
    entries = CheckpointManifest(str(d)).load()
    assert entries[0].sketches == {}
