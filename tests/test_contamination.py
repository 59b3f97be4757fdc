"""Benchmark decontamination (operators/dedup.py:contamination_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slower_whisper_spark.operators.dedup import contamination_pairs


def test_planted_snippet_found_reversed_not(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    train = spark.createDataFrame(
        [(1, base), (2, "totally different words one two three four five six seven")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            (100, "gamma delta epsilon zeta eta theta"),   # contiguous snippet of 1
            (101, "mu lam kappa iota theta eta zeta"),     # reversed order: no 5-gram
            (102, "one two three four five"),              # exact 5-gram of 2
        ],
        "eval_id long, text string",
    )
    got = {
        (r.eval_id, r.train_id): r.containment
        for r in contamination_pairs(
            train, evals, shingle_n=5, min_containment=0.5
        ).collect()
    }
    assert got[(100, 1)] == 1.0
    assert got[(102, 2)] == 1.0
    assert not any(e == 101 for e, _ in got)


def test_containment_fraction_and_threshold(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    # eval has 6 tokens -> two 5-grams; only 'a b c d e'/'b c d e f' overlap
    evals = spark.createDataFrame(
        [(9, "a b c d e zzz")], "eval_id long, text string"
    )
    rows = contamination_pairs(
        train, evals, shingle_n=5, min_containment=0.4
    ).collect()
    assert len(rows) == 1 and rows[0].containment == 0.5
    assert (
        contamination_pairs(train, evals, shingle_n=5, min_containment=0.6).count()
        == 0
    )


def test_corpus_side_never_shuffles_raw_shingles(spark, docs_small):
    """Plan contract: the only exchanges are the (train_id, eval_id)
    aggregate — the broadcast eval set filters train shingles map-side."""
    from slower_whisper_spark.plans import explain_str

    docs, _, _ = docs_small
    train = docs.where(F.col("text").isNotNull()).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    evals = train.where(F.abs(F.hash("text")) % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    plan = explain_str(contamination_pairs(train, evals))
    assert "BroadcastExchange" in plan
    lines = plan.splitlines()
    for i, ln in enumerate(lines[:-1]):
        node = ln.strip()
        if node.endswith("Exchange") and not node.endswith("BroadcastExchange") and (
            "Input" in lines[i + 1]
        ):
            # shuffle inputs are the aggregate partials, never bare shingles
            assert "count" in lines[i + 1] or "train_id" in lines[i + 1], lines[i + 1]
