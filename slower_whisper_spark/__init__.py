"""slower_whisper_spark — a PySpark-native schema + constraint validation engine.

Built from scratch (not a port) with the validation capabilities of
EffortlessMetrics/slower-whisper generalized into a declarative constraint DSL
evaluated by Spark over Common-Crawl-style webtext tables
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Reference semantics (see SURVEY.md):
  - schema-versioned, content-hashed rule suites   (ref: transcription/schema/registry.py)
  - per-partition pass/fail verdicts + violation rows (url, rule_id, observed, expected)
                                                   (ref: transcription/schema/validator.py:128-136)
  - resumable batch with per-partition lineage     (ref: transcription/pipeline.py:167-253)
  - baseline regression / drift gates              (ref: transcription/benchmark_cli.py:476-540)

Everything compiles to Spark SQL expressions or Arrow-batch pandas UDFs:
zero per-row Python in the hot path.
"""

from slower_whisper_spark.suite import ConstraintSuite, SuiteResult
from slower_whisper_spark.rules import (
    NotNull,
    Const,
    Enum,
    Pattern,
    Range,
    Length,
    TypeCheck,
    Nested,
    Vectorized,
    Expr,
    Conditional,
    Unique,
    ForeignKey,
    HashInvariant,
    Drift,
)
from slower_whisper_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "ConstraintSuite",
    "SuiteResult",
    "NotNull",
    "Const",
    "Enum",
    "Pattern",
    "Range",
    "Length",
    "TypeCheck",
    "Nested",
    "Vectorized",
    "Expr",
    "Conditional",
    "Unique",
    "ForeignKey",
    "HashInvariant",
    "Drift",
    "get_spark",
    "__version__",
]
