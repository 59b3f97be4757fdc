"""Quality signals as suite rules (rules/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slower_whisper_spark import ConstraintSuite
from slower_whisper_spark.rules.quality import Quality, quality_rules


def test_rules_fold_into_single_pass(spark):
    rows = [
        (1, "the cat sat and it was that good for us all of the time", "en", "s0"),
        (2, "tiny", "en", "s0"),                     # min_tokens viol
        (3, None, "en", "s1"),                       # NULL text fails tokens+swr, dup3 vacuous
        (4, "x " * 30, "fr", "s1"),                  # swr + dup3 + lang viols
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    suite = ConstraintSuite(
        "qg",
        quality_rules(min_tokens=3, min_stopword_ratio=0.05,
                      max_dup3_fraction=0.3, lang_col="lang"),
    )
    res = suite.validate(df, key_col="doc_id", partition_col="source")
    v = {(r.partition, r.rule_id): r.violations for r in res.verdicts.collect()}
    assert v[("s0", "quality_min_tokens(text)")] == 1
    assert v[("s1", "quality_min_tokens(text)")] == 1          # NULL text fails
    assert v[("s1", "quality_max_dup3_fraction(text)")] == 1   # doc 4 only (NULL vacuous)
    assert v[("s1", "quality_lang_allowed(lang)")] == 1
    assert v[("s0", "quality_min_stopword_ratio(text)")] == 1  # 'tiny' has no stopwords
    # violation rows carry the measured signal
    viol = res.violations.where(
        (F.col("rule_id") == "quality_min_tokens(text)") & (F.col("key") == "2")
    ).collect()
    assert viol and viol[0].observed == "1"


def test_spec_roundtrip_and_registry_hash(spark):
    from slower_whisper_spark.migrate import suite_from_spec

    suite = ConstraintSuite("qg", [Quality("min_tokens", "text", 10),
                                   Quality("lang_allowed", "lang", langs=("en", "de"))])
    spec = suite.spec()
    rebuilt = suite_from_spec(spec)
    assert rebuilt.spec() == spec  # identity model: hash-stable recompile
    rows = [(1, "short", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = suite.validate(df, key_col="doc_id").verdicts.collect()
    b = rebuilt.validate(df, key_col="doc_id").verdicts.collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
