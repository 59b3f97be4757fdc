"""Slice 0: suite end-to-end on the synthetic webtext table.

Golden-style asserts on exact violation counts implied by the deterministic
corruption plan (ref test model: golden fixtures
tests/fixtures/semantic_golden/*.json asserted exact-match, SURVEY.md §5.3).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from slower_whisper_spark import (
    ConstraintSuite,
    Enum,
    Expr,
    Length,
    NotNull,
    Pattern,
    Range,
)

LANG_RE = r"^[a-z]{2}(-[A-Z]{2})?$"
WINDOW_LO = datetime.datetime(2026, 7, 1)
WINDOW_HI = datetime.datetime(2026, 7, 31)


def _std_suite():
    return ConstraintSuite(
        "webtext-std",
        [
            NotNull("url"),
            NotNull("lang", rule_id="not_null(lang)"),
            Pattern("lang", LANG_RE),
            Range("warc_ts", min=WINDOW_LO, max=WINDOW_HI),
            Length("text", min=1),
            Expr("length(html) >= 16", rule_id="html_min_bytes", expected="html >= 16 bytes"),
        ],
    )


def test_suite_hash_stable_and_order_insensitive_fields():
    s1 = _std_suite()
    s2 = _std_suite()
    assert s1.suite_hash == s2.suite_hash
    assert len(s1.suite_hash) == 64
    # changing any rule parameter changes the hash
    s3 = ConstraintSuite("webtext-std", [NotNull("url")])
    assert s3.suite_hash != s1.suite_hash


def test_validate_counts_match_manual_counts(docs_small):
    docs, _, _ = docs_small
    suite = _std_suite()
    res = suite.validate(docs, key_col="url", partition_col="warc_day", violation_limit=1000)

    verd = res.verdicts.toPandas()
    assert set(verd.columns) == {"partition", "rule_id", "passed", "rows", "violations", "observed", "expected"}

    # totals per rule vs direct DataFrame counts
    totals = verd.groupby("rule_id")["violations"].sum().to_dict()
    n_null_lang = docs.filter(F.col("lang").isNull()).count()
    n_bad_lang = docs.filter(
        F.col("lang").isNull() | ~F.col("lang").rlike(LANG_RE)
    ).count()
    n_oow = docs.filter(
        F.col("warc_ts").isNull()
        | (F.col("warc_ts") < F.lit(WINDOW_LO))
        | (F.col("warc_ts") > F.lit(WINDOW_HI))
    ).count()
    assert totals["not_null(url)"] == 0
    assert totals["not_null(lang)"] == n_null_lang > 0
    assert totals["pattern(lang)"] == n_bad_lang > n_null_lang
    assert totals["range(warc_ts)"] == n_oow > 0
    assert totals["length(text)"] == 0

    # rows roll up to the table size
    assert verd[verd.rule_id == "not_null(url)"]["rows"].sum() == docs.count()


def test_violation_rows_shape_and_content(docs_small):
    docs, _, _ = docs_small
    suite = _std_suite()
    res = suite.validate(docs, key_col="url", partition_col="warc_day", violation_limit=10_000)
    viol = res.violations.toPandas()
    assert list(viol.columns) == ["key", "rule_id", "observed", "expected"]

    bad_lang = viol[viol.rule_id == "pattern(lang)"]
    assert len(bad_lang) > 0
    # every reported key really does violate
    bad_keys = set(bad_lang["key"])
    actual_bad = {
        r["url"]
        for r in docs.filter(F.col("lang").isNull() | ~F.col("lang").rlike(LANG_RE))
        .select("url")
        .collect()
    }
    assert bad_keys <= actual_bad
    # NULL lang rows report observed NULL
    nulls = viol[(viol.rule_id == "not_null(lang)")]
    assert (nulls["observed"] == "NULL").all()


def test_violation_limit_per_rule(docs_small):
    docs, _, _ = docs_small
    suite = _std_suite()
    res = suite.validate(docs, key_col="url", partition_col="warc_day", violation_limit=5)
    counts = res.violations.groupBy("rule_id").count().toPandas()
    assert (counts["count"] <= 5).all()


def test_partition_status_vocabulary(docs_small):
    docs, _, _ = docs_small
    suite = _std_suite()
    res = suite.validate(docs, key_col="url", partition_col="warc_day")
    st = res.partition_status().toPandas()
    assert set(st["status"]) <= {"success", "partial"}
    assert (st["rows"] > 0).all()
    assert not res.overall_passed()


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [("https://a/1", "en"), ("https://a/2", "fr")], "url string, lang string"
    )
    suite = ConstraintSuite("mini", [NotNull("url"), Pattern("lang", LANG_RE)])
    res = suite.validate(df, key_col="url")
    assert res.overall_passed()
    assert res.violations.count() == 0
    st = res.partition_status().toPandas()
    assert list(st["status"]) == ["success"]


def test_unpartitioned_validation(docs_small):
    docs, _, _ = docs_small
    suite = ConstraintSuite("mini", [Pattern("lang", LANG_RE)])
    res = suite.validate(docs, key_col="url")  # no partition col → "ALL"
    verd = res.verdicts.toPandas()
    assert list(verd["partition"].unique()) == ["ALL"]


def test_conditional_rule(spark):
    from slower_whisper_spark import Conditional

    df = spark.createDataFrame(
        [("a", "purchase", 5.0), ("b", "purchase", -1.0), ("c", "view", -9.0)],
        "id string, etype string, value double",
    )
    suite = ConstraintSuite(
        "cond", [Conditional("etype = 'purchase'", "value > 0", rule_id="purchase_positive")]
    )
    res = suite.validate(df, key_col="id")
    viol = res.violations.toPandas()
    assert list(viol["key"]) == ["b"]  # 'c' passes vacuously


def test_vectorized_rule_batch_escape_hatch(spark):
    """Arrow-batch plugin rule: validation result + impl-fingerprint
    identity (editing the function invalidates the suite hash)."""
    from slower_whisper_spark import ConstraintSuite, Vectorized

    df = spark.createDataFrame(
        [("1", "one two three four five"), ("2", "too short"), ("3", None)],
        "id string, text string",
    )

    def min5(s):
        return (s.str.split().str.len() >= 5).fillna(False)

    res = ConstraintSuite("v", [Vectorized("text", min5, rule_id="m5")]).validate(
        df, key_col="id", violation_limit=10
    )
    viol = {r["key"] for r in res.violations.collect()}
    assert viol == {"2", "3"}

    def min5_variant(s):
        return (s.str.split().str.len() >= 4).fillna(False)

    h1 = ConstraintSuite("v", [Vectorized("text", min5, rule_id="m5")]).suite_hash
    h2 = ConstraintSuite("v", [Vectorized("text", min5_variant, rule_id="m5")]).suite_hash
    assert h1 != h2

    # allow_null: a null RESULT from the batch fn falls back to allow_null
    def nully(s):
        import pandas as pd
        return pd.Series([None] * len(s), index=s.index, dtype=object)

    res2 = ConstraintSuite("v", [Vectorized("text", nully, rule_id="n", allow_null=True)]).validate(
        df, key_col="id"
    )
    assert res2.verdicts.collect()[0]["violations"] == 0


def test_overlapped_materialize_matches_sequential(docs_small):
    """The scaling-path form — validate(pass2_prune=False) returning fully
    lazy + materialize(parallel=True) running verdicts/violations/stats as
    concurrent jobs — must produce exactly the rows of the default pruned
    sequential path (same verdicts, same violation set, same stats)."""
    docs, _, _ = docs_small
    suite = _std_suite()

    seq = suite.validate(
        docs, key_col="url", partition_col="warc_day", violation_limit=1000,
        stats_columns=["url", "lang"],
    )
    seq_out = seq.materialize(parallel=False)

    par = suite.validate(
        docs, key_col="url", partition_col="warc_day", violation_limit=1000,
        stats_columns=["url", "lang"], pass2_prune=False,
    )
    par_out = par.materialize(parallel=True)

    def vset(rows):
        return {tuple(r) for r in rows}

    assert vset(par_out["verdicts"]) == vset(seq_out["verdicts"])
    assert par_out["n_violations"] == seq_out["n_violations"] > 0
    assert vset(par_out["stats"]) == vset(seq_out["stats"])
    # violation ROW sets equal too (limit high enough to be inert here)
    assert vset(par.violations.collect()) == vset(seq.violations.collect())
    seq.unpersist()
    par.unpersist()
