"""Byte-identity invariant: sha2(column) must equal a per-key expected hash.

This is the engine's per-row invariant vs the reference ("byte-identical
extracted text per url", BASELINE.json input_hint); the ancestor is the
reference's content-hash integrity verification
(ref: transcription/schema/integrity.py:222-335 — recompute hash, compare to
lockfile, strict raises).

Physical strategy: a single equi-join on the key column between the fact
table (projected to key + sha2) and the expected-hash table. At 100 TB both
sides should be bucketed by key on disk so the join is co-located
(no shuffle); at test scale Spark's shuffled hash/sort-merge join with AQE is
fine. The hash itself is JVM-side (``sha2``), no Python.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import TableRule


class HashInvariant(TableRule):
    def __init__(
        self,
        column: str,
        expected_df: DataFrame,
        expected_key: str = "url",
        expected_hash_col: str = "text_sha256",
        rule_id: str | None = None,
        missing_is_violation: bool = False,
    ):
        self.column = column
        self.expected_df = expected_df
        self.expected_key = expected_key
        self.expected_hash_col = expected_hash_col
        self.missing_is_violation = missing_is_violation
        self.rule_id = rule_id or f"hash_invariant({column})"

    def spec(self) -> dict[str, Any]:
        return {
            "type": "hash_invariant",
            "column": self.column,
            "expected_key": self.expected_key,
            "expected_hash_col": self.expected_hash_col,
            "missing_is_violation": self.missing_is_violation,
            "rule_id": self.rule_id,
        }

    def evaluate(
        self,
        df: DataFrame,
        *,
        key_col: str,
        partition_col: str,
        violation_limit: int,
    ) -> tuple[DataFrame, DataFrame | None]:
        actual = df.select(
            F.col(partition_col).cast("string").alias("__part"),
            F.col(key_col).cast("string").alias("__key"),
            F.sha2(F.col(self.column).cast("binary"), 256).alias("__actual"),
        )
        expected = self.expected_df.select(
            F.col(self.expected_key).cast("string").alias("__key"),
            F.col(self.expected_hash_col).alias("__expected"),
        )
        joined = actual.join(expected, "__key", "left")
        if self.missing_is_violation:
            bad = joined.filter(
                F.col("__expected").isNull() | (F.col("__actual") != F.col("__expected"))
            )
        else:
            bad = joined.filter(
                F.col("__expected").isNotNull() & (F.col("__actual") != F.col("__expected"))
            )
        # mismatches are rare; persist them so the verdict agg and the
        # violation projection don't each re-run the full join
        bad = bad.persist()

        verdicts = (
            bad.groupBy("__part")
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.col("__part").alias("partition"),
                F.lit(self.rule_id).alias("rule_id"),
                F.lit(False).alias("passed"),
                F.col("violations").cast("long").alias("violations"),
                F.concat(F.col("violations").cast("string"), F.lit(" rows with hash mismatch")).alias("observed"),
                F.lit(f"sha256({self.column}) == expected").alias("expected"),
            )
        )
        violations = (
            bad.select(
                F.col("__key").alias("key"),
                F.lit(self.rule_id).alias("rule_id"),
                F.coalesce(F.col("__actual"), F.lit("NULL")).alias("observed"),
                F.coalesce(F.col("__expected"), F.lit("<no expected row>")).alias("expected"),
            )
            .orderBy("key")
            .limit(violation_limit)
        )
        return verdicts, violations
