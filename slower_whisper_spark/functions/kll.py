"""Mergeable quantile sketches (KLL) — the missing mergeable stat.

HLL distinct sketches are already mergeable via Spark's built-ins
(stats.py hll_sketch_agg / hll_union_agg); quantiles were the gap:
``percentile_approx`` (Greenwald-Khanna) computes in-pass but its state is
neither persistable nor mergeable across runs. SURVEY §4.2 calls for
KLL-in-``applyInPandas`` round-tripping through the checkpoint manifest
(reference baseline-stat ancestor: transcription/audio_enrichment.py:282-320).

This module implements the KLL sketch (Karnin-Lang-Liberty, FOCS'16) in
pure numpy:

  * per-partition build via ``applyInPandas`` (Arrow batches, zero per-row
    Python) → one (partition, n, sketch binary) row per partition;
  * sketches SERIALIZE to a compact little-endian byte string → base64 in
    the manifest;
  * MERGE is associative/commutative: union per-run partition sketches into
    table-level or cross-run quantiles without rescanning data.

Size/error: a k=200 sketch holds ≤ ~3k doubles (~5 KB) with ~1.3% rank
error regardless of n — 10^12 rows per partition cost the same bytes.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

_MAGIC = 0x4B4C4C31  # "KLL1"
_MIN_CAP = 8
_C = 2.0 / 3.0


class KLLSketch:
    """Compactor-stack quantile sketch. Level-i items carry weight 2^i;
    an over-capacity level sorts, keeps every other item (seeded
    deterministic offset), and promotes the survivors one level up."""

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.n = 0
        self._rng_state = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]

    # ---------------------------------------------------------------- #
    def _cap(self, level: int, depth: int) -> int:
        return max(int(self.k * (_C ** (depth - 1 - level))), _MIN_CAP)

    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        while True:
            depth = len(self.levels)
            for i in range(depth):
                if self.levels[i].size > self._cap(i, depth):
                    self._compact(i)
                    break
            else:
                return

    def _compact(self, i: int) -> None:
        buf = np.sort(self.levels[i])
        self._rng_state = (self._rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        off = int(self._rng_state & 1)
        promoted = buf[off::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # ---------------------------------------------------------------- #
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if buf.size:
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._rng_state ^= other._rng_state
        self._compress()
        return self

    # ---------------------------------------------------------------- #
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 1 << i, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(q)
        it, wt = self._weighted_items()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(wt)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ---------------------------------------------------------------- #
    def serialize(self) -> bytes:
        head = [_MAGIC, self.k, self.n, self._rng_state, len(self.levels)] + [
            int(b.size) for b in self.levels
        ]
        out = struct.pack("<i", len(head)) + struct.pack(f"<{len(head)}q", *head)
        return out + b"".join(np.ascontiguousarray(b, dtype="<f8").tobytes() for b in self.levels)

    @staticmethod
    def deserialize(raw: bytes) -> "KLLSketch":
        (hn,) = struct.unpack_from("<i", raw, 0)
        head = struct.unpack_from(f"<{hn}q", raw, 4)
        magic, k, n, rng, depth = head[:5]
        if magic != _MAGIC:
            raise ValueError("not a KLL1 sketch")
        sizes = head[5 : 5 + depth]
        sk = KLLSketch(k=int(k))
        sk.n = int(n)
        sk._rng_state = int(rng)
        off = 4 + 8 * hn
        levels = []
        for s in sizes:
            levels.append(np.frombuffer(raw, dtype="<f8", count=int(s), offset=off).copy())
            off += 8 * int(s)
        sk.levels = levels or [np.empty(0, dtype=np.float64)]
        return sk


# --------------------------------------------------------------------- #
# Spark integration
# --------------------------------------------------------------------- #
def kll_profile(
    df: DataFrame,
    column: str,
    *,
    partition_col: str | None = None,
    k: int = 200,
    deterministic: bool = False,
) -> DataFrame:
    """(partition, n, sketch binary) — one KLL sketch per partition, built
    in a single grouped Arrow pass (``applyInPandas``; numpy inside, zero
    per-row Python). The sketches are the persistable/mergeable stat: b64
    them into the checkpoint manifest, union across partitions or runs with
    ``merge_sketch_rows``. For a partition too large for one group, split it
    (e.g. by spark_partition_id) and merge — merging is lossless-associative
    by construction.

    ``deterministic``: sort each group's values before sketching. KLL is
    input-order-sensitive (compaction offsets follow a seeded LCG over the
    insertion sequence); group rows arrive in shuffle order, so two runs over
    the same data can otherwise yield byte-different (equally valid) sketches.
    Sorting makes the sketch a pure function of the partition's value
    MULTISET — required when sketches feed content-addressed stores or
    replayed-literal oracles. Cost: one numpy sort per group, O(n log n) on
    data already resident in the Arrow batch."""
    from pyspark.sql import functions as F

    pcol = partition_col or "__all"
    src = df if partition_col is not None else df.withColumn("__all", F.lit("ALL"))
    # '(' marks a derived expression ("length(text)"); anything else stays a
    # plain column lookup so names F.expr would mis-parse (hyphens, spaces)
    # keep working
    vcol = F.expr(column) if "(" in column else F.col(column)
    narrow = src.select(
        F.col(pcol).cast("string").alias("partition"), vcol.cast("double").alias("__v")
    )

    def build(pdf):
        import pandas as pd

        sk = KLLSketch(k=k, seed=1)
        v = pdf["__v"].to_numpy(dtype=np.float64, na_value=np.nan)
        if deterministic:
            v = np.sort(v)  # NaNs sort last; update_batch drops them either way
        sk.update_batch(v)
        return pd.DataFrame(
            {"partition": [pdf["partition"].iloc[0]], "n": [sk.n], "sketch": [sk.serialize()]}
        )

    return narrow.groupBy("partition").applyInPandas(
        build, schema="partition string, n long, sketch binary"
    )


def merge_sketch_rows(sketches: list[bytes], k: int = 200) -> KLLSketch:
    """Union serialized sketches (from kll_profile rows or manifest b64)
    into one table-level sketch."""
    out = KLLSketch(k=k, seed=1)
    for raw in sketches:
        out.merge(KLLSketch.deserialize(bytes(raw)))
    return out
