"""Deterministic sampling / mixing / domain caps (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slower_whisper_spark.operators.sampling import (
    deterministic_sample,
    domain_cap,
    sample_bucket,
    stratified_sample,
)


def test_sample_reproducible_and_rate(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = deterministic_sample(df, key_col="k", fraction=0.25)
    b = deterministic_sample(df, key_col="k", fraction=0.25)
    na = a.count()
    assert na == b.count()  # pure function of the key
    assert abs(na / 20_000 - 0.25) < 0.02
    # repartitioning must not change membership
    c = deterministic_sample(df.repartition(17), key_col="k", fraction=0.25)
    assert c.count() == na
    assert a.join(c, "k", "left_anti").count() == 0


def test_sample_nested_and_salt_independent(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    small = set(r.k for r in deterministic_sample(df, key_col="k", fraction=0.1).collect())
    big = set(r.k for r in deterministic_sample(df, key_col="k", fraction=0.3).collect())
    assert small <= big  # coordinated: thresholds nest
    other = set(
        r.k for r in deterministic_sample(df, key_col="k", fraction=0.1, salt="s2").collect()
    )
    overlap = len(small & other) / max(len(small), 1)
    assert 0.0 < overlap < 0.25  # independent draw ~ fraction itself


def test_stratified_fractions_and_default(spark):
    rows = [(i, ["en", "de", "fr", None][i % 4]) for i in range(8_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_sample(
        df, strata_col="lang", fractions={"en": 0.5, "de": 0.1},
        key_col="k", default_fraction=0.0,
    )
    got = out.groupBy("lang").count().collect()
    rates = {r.lang: r["count"] / 2_000 for r in got}
    assert abs(rates.get("en", 0) - 0.5) < 0.06
    assert abs(rates.get("de", 0) - 0.1) < 0.04
    assert "fr" not in rates and None not in rates  # default 0 drops them


def test_domain_cap_rank_and_ties(spark):
    rows = [
        ("d1", 1, 100), ("d1", 2, 100), ("d1", 3, 90),
        ("d1", 4, 80), ("d2", 5, 10),
    ]
    df = spark.createDataFrame(rows, "domain string, id long, score long")
    out = domain_cap(df, domain_col="domain", cap=2, order_col="score", tiebreak_col="id")
    got = {(r.domain, r.id): r.domain_rank for r in out.collect()}
    # tie at 100 broken by ascending id
    assert got == {("d1", 1): 1, ("d1", 2): 2, ("d2", 5): 1}


def test_bucket_matches_duckdb(spark):
    import duckdb

    df = spark.range(500).select(
        F.col("id").alias("k"), sample_bucket("k").alias("b")
    )
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT "
            "FROM generate_series(0, 499) AS t(i)"
        ).fetchall()
    )
    for r in df.collect():
        assert r.b == want[r.k], (r.k, r.b, want[r.k])


def test_mixture_report_consistent_with_sample(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], "w " * (i % 7 + 1)) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, lang string, text string")
    from slower_whisper_spark.operators.sampling import mixture_report

    rep = {r.stratum: r for r in mixture_report(
        df, strata_col="lang", fractions={"en": 0.5}, key_col="k",
        default_fraction=0.1,
    ).collect()}
    sampled = stratified_sample(
        df, strata_col="lang", fractions={"en": 0.5}, key_col="k",
        default_fraction=0.1,
    )
    got = {r.lang: r["count"] for r in sampled.groupBy("lang").count().collect()}
    for lg in ("en", "de", "fr"):
        assert rep[lg].docs_kept == got.get(lg, 0)
        assert rep[lg].docs_total == 1000
        assert rep[lg].tokens_kept <= rep[lg].tokens_total
        assert rep[lg].realized_frac == round(rep[lg].docs_kept / 1000, 6)
