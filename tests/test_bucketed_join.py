"""Bucketed-table co-location: the shuffle-free join path for the
HashInvariant expected-hash join at 100 TB.

At 10^12 docs the byte-identity join (docs ⋈ expected_hashes on url) is the
one join where BOTH sides are fact-sized — broadcast is impossible and a
shuffle moves the whole table. Writing both sides bucketed by the join key
with the same bucket count pre-co-locates them: the SortMergeJoin reads
bucket i of each table in the same task and NO Exchange appears in the plan.
This test proves the engine's tables + plan do exactly that.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, docs_small, tmp_path_factory):
    docs, expected, _ = docs_small
    base = str(tmp_path_factory.mktemp("buck"))
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS expected_b")
    (
        docs.select("url", "text", "lang")
        .write.mode("overwrite")
        .option("path", f"{base}/docs_b")
        .bucketBy(N_BUCKETS, "url")
        .sortBy("url")
        .saveAsTable("docs_b")
    )
    (
        expected.write.mode("overwrite")
        .option("path", f"{base}/expected_b")
        .bucketBy(N_BUCKETS, "url")
        .sortBy("url")
        .saveAsTable("expected_b")
    )
    yield spark.table("docs_b"), spark.table("expected_b")
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS expected_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Same key, same bucket count ⇒ SortMergeJoin with ZERO Exchange nodes
    (broadcast disabled so the test exercises the co-location, not AQE's
    small-table shortcut)."""
    docs_b, expected_b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = docs_b.join(expected_b, "url").select(
            "url", (F.sha2(F.col("text").cast("binary"), 256) == F.col("text_sha256")).alias("ok")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1200]
        assert "Exchange" not in plan, plan[:1200]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables, docs_small):
    docs_b, expected_b = bucketed_tables
    docs, expected, _ = docs_small
    got = docs_b.join(expected_b, "url").count()
    want = docs.join(expected, "url").count()
    assert got == want > 0
