"""Cross-field and conditional row rules.

Mirrors the reference's second-pass "semantic" validation — cross-field
predicates (`end > start`, ref: transcription/conversation_physics.py:99-101;
`min_speakers <= max_speakers`, ref: transcription/config_validation.py:163-166)
and conditional requires ("if type==X then payload matches Y",
ref: transcription/schemas/stream_event.schema.json:54-195 and
historian/validation.py:224-246) — as arbitrary SQL boolean expressions.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import RowRule, _str


class Expr(RowRule):
    """Arbitrary SQL boolean expression over any columns of the row.

    ``observed_expr`` is a SQL expression projected into violation rows
    (defaults to the predicate text itself).
    """

    def __init__(
        self,
        sql_predicate: str,
        rule_id: str,
        observed_expr: str | None = None,
        expected: str | None = None,
    ):
        self.sql_predicate = sql_predicate
        self.observed_expr = observed_expr
        self.expected_text = expected or f"satisfies: {sql_predicate}"
        self.rule_id = rule_id

    def spec(self) -> dict[str, Any]:
        return {
            "type": "expr",
            "predicate": self.sql_predicate,
            "observed": self.observed_expr,
            "expected": self.expected_text,
            "rule_id": self.rule_id,
        }

    def predicate(self) -> Column:
        return F.coalesce(F.expr(self.sql_predicate), F.lit(False))

    def observed(self) -> Column:
        if self.observed_expr:
            return _str(F.expr(self.observed_expr))
        return F.lit(f"violates: {self.sql_predicate}")

    def expected(self) -> Column:
        return F.lit(self.expected_text)


class Conditional(RowRule):
    """if <when_sql> then <then_sql> — rows where the antecedent is false
    (or null) pass vacuously, matching JSON-Schema if/then semantics."""

    def __init__(
        self,
        when_sql: str,
        then_sql: str,
        rule_id: str,
        observed_expr: str | None = None,
    ):
        self.when_sql = when_sql
        self.then_sql = then_sql
        self.observed_expr = observed_expr
        self.rule_id = rule_id

    def spec(self) -> dict[str, Any]:
        return {
            "type": "conditional",
            "when": self.when_sql,
            "then": self.then_sql,
            "observed": self.observed_expr,
            "rule_id": self.rule_id,
        }

    def predicate(self) -> Column:
        antecedent = F.coalesce(F.expr(self.when_sql), F.lit(False))
        consequent = F.coalesce(F.expr(self.then_sql), F.lit(False))
        return F.when(antecedent, consequent).otherwise(F.lit(True))

    def observed(self) -> Column:
        if self.observed_expr:
            return _str(F.expr(self.observed_expr))
        return F.lit(f"when({self.when_sql}) violates: {self.then_sql}")

    def expected(self) -> Column:
        return F.lit(f"if {self.when_sql} then {self.then_sql}")
