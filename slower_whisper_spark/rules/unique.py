"""Uniqueness check with explicit skew handling.

North-rule requirement: "uniqueness on url via salted repartition +
hash-dedup to defuse host-domain skew". The reference's ancestor is its
dedup-by-span / unique-speaker-set logic (ref: transcription/privacy.py:425-452,
transcription/models.py:716-723) — here it becomes a two-phase distributed
aggregation:

  phase 1: ``groupBy(partition_value, key)`` — Spark's hash aggregate does
           map-side partial aggregation, so a hot key (one url duplicated
           millions of times, or a mega-host's rows concentrated in a few
           input splits) is collapsed to one row per task BEFORE the
           shuffle. The (partition_value, key) composite acts as the salt:
           phase-1 output is at most |partitions| rows per key.
  phase 2: re-aggregate per key to a global count; keys with count > 1 are
           duplicates. This shuffles only the phase-1 partials (≈ distinct
           keys), never the raw rows.

Attribution back to table partitions joins the (small, duplicate-only) key
set against the phase-1 partials — not against the raw table — so the
verdict pass adds no second full scan.

At small scale this is provably equivalent to naive
``dropDuplicates``/``count`` (asserted in tests/test_unique.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import TableRule


class Unique(TableRule):
    # a key duplicated across two table partitions is this rule's whole
    # point: on resumed/pruned runs the suite must feed it the full table
    cross_partition = True

    def __init__(self, column: str, rule_id: str | None = None, salt_buckets: int = 0):
        """salt_buckets > 0 adds an explicit random-free salt (hash of the
        key modulo buckets) as an extra phase-1 grouping term. With a real
        partition column present this is redundant (the partition value
        already salts phase 1); it engages for unpartitioned tables (the
        suite passes the synthetic '__all' constant there)."""
        self.column = column
        self.salt_buckets = salt_buckets
        self.rule_id = rule_id or f"unique({column})"

    def spec(self) -> dict[str, Any]:
        return {
            "type": "unique",
            "column": self.column,
            "salt_buckets": self.salt_buckets,
            "rule_id": self.rule_id,
        }

    def evaluate(
        self,
        df: DataFrame,
        *,
        key_col: str,
        partition_col: str,
        violation_limit: int,
        persisted: list[DataFrame] | None = None,
    ) -> tuple[DataFrame, DataFrame | None]:
        key = F.col(self.column)
        group_cols = [F.col(partition_col).cast("string").alias("__part"), key.alias("__key")]
        if self.salt_buckets > 0 and (partition_col is None or partition_col == "__all"):
            # unpartitioned table: the suite passes the synthetic '__all'
            # constant, which contributes nothing to phase-1 spreading —
            # the explicit hash salt takes over
            group_cols.append(
                F.pmod(F.xxhash64(key), F.lit(self.salt_buckets)).alias("__salt")
            )

        # phase 1: per-(partition, key) partial counts (map-side combine)
        per_part = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__cnt_part"))

        # phase 2: global per-key totals from the partials
        global_cnt = per_part.groupBy("__key").agg(F.sum("__cnt_part").alias("__cnt"))
        dup_keys = global_cnt.filter(F.col("__cnt") > 1)

        # attribute duplicated keys back to partitions via the partials;
        # duplicates are rare → persist so verdicts and violations share one
        # computation of the two-phase aggregation
        dup_keys = dup_keys.persist()
        if persisted is not None:
            persisted.append(dup_keys)
        attributed = per_part.join(dup_keys, "__key")

        verdicts = (
            attributed.groupBy("__part")
            .agg(F.sum("__cnt_part").alias("violations"))
            .select(
                F.col("__part").alias("partition"),
                F.lit(self.rule_id).alias("rule_id"),
                F.lit(False).alias("passed"),
                F.col("violations").cast("long").alias("violations"),
                F.concat(F.col("violations").cast("string"), F.lit(" rows with duplicated key")).alias("observed"),
                F.lit(f"{self.column} unique").alias("expected"),
            )
        )

        violations = (
            dup_keys.select(
                F.col("__key").cast("string").alias("key"),
                F.lit(self.rule_id).alias("rule_id"),
                F.concat(F.lit("count="), F.col("__cnt").cast("string")).alias("observed"),
                F.lit("count=1").alias("expected"),
            )
            .orderBy("key")
            .limit(violation_limit)
        )
        return verdicts, violations
