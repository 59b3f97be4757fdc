"""Plan-introspection helpers: assert the physical plan is the one we want
(pushdown reached the scan, codegen fused, joins broadcast)."""

from slower_whisper_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_ids",
]
