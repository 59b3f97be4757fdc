"""Arrow-batch escape-hatch rule — the pluggable-processor surface.

The reference exposes plugin points for custom per-segment logic
(``SegmentProcessor`` Protocol, ref: transcription/post_process.py:97-114;
analyzer registry, historian/analyzers/base.py:86). The engine's analog is
a RULE whose predicate is a user-supplied BATCH function
``pd.Series -> bool array`` compiled to one Arrow-batch pandas UDF — the
only sanctioned Python execution path (north rule: zero per-row Python).

Use it only for constraints Spark SQL genuinely can't express (external
model scores, bespoke parsers); everything expressible stays JVM-side.

Identity: spec() fingerprints the function's SOURCE (sha256), so editing
the implementation changes the suite hash and invalidates checkpoints like
any rule change. Not rebuildable from a spec (the function isn't data) —
registry/CLI suites should keep to declarative rules.
"""

from __future__ import annotations

import hashlib
import inspect
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from slower_whisper_spark.rules.base import RowRule, _str


class Vectorized(RowRule):
    def __init__(
        self,
        column: str,
        batch_fn: Callable,
        rule_id: str,
        expected: str = "",
        allow_null: bool = False,
    ):
        """``batch_fn``: pd.Series (one Arrow batch of ``column``) →
        boolean array/Series, True = pass. NULL inputs reach the function;
        a null/NaN RESULT falls back to ``allow_null``."""
        self.column = column
        self.batch_fn = batch_fn
        self.allow_null = allow_null
        self.expected_text = expected or f"passes {getattr(batch_fn, '__name__', 'batch_fn')}"
        self.rule_id = rule_id
        self._udf = None

    def _impl_fingerprint(self) -> str:
        try:
            src = inspect.getsource(self.batch_fn)
        except (OSError, TypeError):  # builtins / C funcs: name is the best we have
            src = repr(self.batch_fn)
        return hashlib.sha256(src.encode()).hexdigest()

    def spec(self) -> dict[str, Any]:
        return {
            "type": "vectorized",
            "column": self.column,
            "impl_sha256": self._impl_fingerprint(),
            "impl_name": getattr(self.batch_fn, "__name__", "batch_fn"),
            "allow_null": self.allow_null,
            "expected": self.expected_text,
            "rule_id": self.rule_id,
        }

    def predicate(self) -> Column:
        if self._udf is None:
            from slower_whisper_spark.functions.vectorized import make_bool_batch_udf

            self._udf = make_bool_batch_udf(self.batch_fn)
        return F.coalesce(self._udf(F.col(self.column)), F.lit(bool(self.allow_null)))

    def observed(self) -> Column:
        return _str(F.col(self.column))

    def expected(self) -> Column:
        return F.lit(self.expected_text)
