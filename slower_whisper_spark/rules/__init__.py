from slower_whisper_spark.rules.base import Rule, RowRule, TableRule
from slower_whisper_spark.rules.schema import NotNull, Const, Enum, Pattern, Range, Length, TypeCheck
from slower_whisper_spark.rules.row import Expr, Conditional
from slower_whisper_spark.rules.nested import Nested
from slower_whisper_spark.rules.vectorized import Vectorized
from slower_whisper_spark.rules.unique import Unique
from slower_whisper_spark.rules.refint import ForeignKey
from slower_whisper_spark.rules.invariant import ExtractionInvariant, HashInvariant
from slower_whisper_spark.rules.quality import Quality, quality_rules
from slower_whisper_spark.rules.json_ingest import (
    DiscriminatedUnion,
    JsonParsable,
    MapKeysAllowed,
    MapValueRange,
    parse_json_column,
)
from slower_whisper_spark.rules.drift import (
    Baseline,
    Drift,
    baseline_from_kll,
    compute_baseline,
    kll_baseline_from_manifest,
)

__all__ = [
    "Rule",
    "RowRule",
    "TableRule",
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
    "ExtractionInvariant",
    "HashInvariant",
    "JsonParsable",
    "MapKeysAllowed",
    "MapValueRange",
    "DiscriminatedUnion",
    "parse_json_column",
    "Drift",
    "Baseline",
    "compute_baseline",
    "baseline_from_kll",
    "kll_baseline_from_manifest",
]
