"""Hypothesis property tests (SURVEY §5.8): sketch error bounds and
operator invariants hold for ARBITRARY inputs, not just the seeded fixture.
Spark-free where possible (KLL is pure numpy) so hypothesis can run many
examples cheaply."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from slower_whisper_spark.functions.kll import KLLSketch


finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(finite, min_size=1, max_size=5000))
def test_kll_quantile_rank_error_bound(xs):
    data = np.asarray(xs, dtype=float)
    sk = KLLSketch(k=200, seed=1)
    sk.update_batch(data)
    assert sk.n == data.size
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        lo = np.searchsorted(srt, est, side="left") / data.size
        hi = np.searchsorted(srt, est, side="right") / data.size
        # estimate's rank interval must be within eps of the target rank
        assert lo - 0.05 <= q <= hi + 0.05


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.lists(finite, min_size=0, max_size=800), min_size=1, max_size=6)
)
def test_kll_merge_is_order_insensitive(parts):
    datas = [np.asarray(p, dtype=float) for p in parts]
    total = int(sum(d.size for d in datas))

    def build(order):
        out = KLLSketch(k=128, seed=1)
        for i in order:
            one = KLLSketch(k=128, seed=1)
            one.update_batch(datas[i])
            out.merge(one)
        return out

    a = build(range(len(datas)))
    b = build(reversed(range(len(datas))))
    assert a.n == b.n == total
    if total:
        alldata = np.sort(np.concatenate(datas))
        for q in (0.25, 0.75):
            for sk in (a, b):
                est = sk.quantile(q)
                lo = np.searchsorted(alldata, est, side="left") / total
                hi = np.searchsorted(alldata, est, side="right") / total
                assert lo - 0.08 <= q <= hi + 0.08


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_kll_serialize_total(data_bytes):
    vals = np.frombuffer(data_bytes[: len(data_bytes) // 8 * 8], dtype="<f8")
    vals = vals[np.isfinite(vals)]
    sk = KLLSketch(k=64, seed=3)
    sk.update_batch(vals)
    back = KLLSketch.deserialize(sk.serialize())
    assert back.n == sk.n
    if sk.n:
        assert back.quantile(0.5) == sk.quantile(0.5)
