"""Nested-array constraint validation.

The reference's core data model is NESTED: a transcript carries
``segments[]`` / ``words[]`` arrays of structs with per-element contracts —
every segment has ``end >= start``, ``id >= 0``, words stay inside their
segment bounds (ref: transcription/schemas/transcript-v2.schema.json:232-238,
403-431; dataclass invariants transcription/models.py:524-579). SURVEY §1.1
promised the exploded-child-table treatment; this module provides BOTH
evaluation strategies:

* ``Nested`` — a RowRule compiling the per-element contract into
  higher-order functions (``forall`` / ``filter``): ONE JVM expression,
  evaluated inside the suite's single pass-1 scan, no explode and no extra
  shuffle. A row fails when ANY element violates the contract (or when the
  array breaks its size bounds). The violation row's ``observed`` shows the
  first offending element as JSON plus its index.

* ``explode_child`` (operators/nested.py) — the child-table path for
  element-LEVEL analytics: one row per array element keyed by the parent,
  ready for any ConstraintSuite/aggregate, rejoinable by parent key.

At 100 TB the HOF form is the default (zero shuffle, scan-local); the child
table is for when you need element-grain verdicts or stats.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import RowRule


class Nested(RowRule):
    """Every element of an array(-of-struct) column satisfies a SQL
    predicate over the element variable ``x``.

    Example::

        Nested("segments", "x.end >= x.start AND x.id >= 0",
               min_size=1, rule_id="segments_wellformed")

    NULL elements fail the predicate (coalesce false). A NULL array passes
    iff ``allow_null``; size bounds (when given) apply to non-null arrays.
    """

    def __init__(
        self,
        column: str,
        element_predicate: str,
        rule_id: str | None = None,
        allow_null: bool = False,
        min_size: int | None = None,
        max_size: int | None = None,
    ):
        self.column = column
        self.element_predicate = element_predicate
        self.allow_null = allow_null
        self.min_size = min_size
        self.max_size = max_size
        self.rule_id = rule_id or f"nested({column})"

    def spec(self) -> dict[str, Any]:
        return {
            "type": "nested",
            "column": self.column,
            "element_predicate": self.element_predicate,
            "allow_null": self.allow_null,
            "min_size": self.min_size,
            "max_size": self.max_size,
            "rule_id": self.rule_id,
        }

    def _elem_ok_sql(self) -> str:
        return f"coalesce(({self.element_predicate}), false)"

    def predicate(self) -> Column:
        col = f"`{self.column}`"
        core = F.expr(f"forall({col}, x -> {self._elem_ok_sql()})")
        size_ok = F.lit(True)
        if self.min_size is not None:
            size_ok = size_ok & (F.size(F.col(self.column)) >= F.lit(self.min_size))
        if self.max_size is not None:
            size_ok = size_ok & (F.size(F.col(self.column)) <= F.lit(self.max_size))
        ok = F.coalesce(core, F.lit(False)) & size_ok
        null_verdict = F.lit(bool(self.allow_null))
        return F.when(F.col(self.column).isNull(), null_verdict).otherwise(ok)

    def observed(self) -> Column:
        """First failing element as JSON + its 0-based index; size-only
        failures report the size."""
        col = f"`{self.column}`"
        bad = F.expr(f"filter({col}, x -> not {self._elem_ok_sql()})")
        first_bad = F.element_at(bad, 1)
        # index of the first failing element in the original array
        idx = F.expr(
            f"array_position(transform({col}, x -> not {self._elem_ok_sql()}), true)"
        )
        return F.coalesce(
            F.when(
                F.size(bad) > 0,
                F.concat(
                    F.lit("element["),
                    (idx - 1).cast("string"),
                    F.lit("]="),
                    F.to_json(first_bad),
                ),
            ).otherwise(F.concat(F.lit("size="), F.size(F.col(self.column)).cast("string"))),
            F.lit("NULL"),
        )

    def expected(self) -> Column:
        parts = [f"forall x: {self.element_predicate}"]
        if self.min_size is not None:
            parts.append(f"size >= {self.min_size}")
        if self.max_size is not None:
            parts.append(f"size <= {self.max_size}")
        return F.lit("; ".join(parts))
