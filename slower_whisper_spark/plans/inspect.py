"""Physical-plan introspection for performance assertions.

The engine's performance contract is testable: filters must reach the
Parquet scan (PushedFilters), projections must prune the read schema
(ReadSchema), dimension joins must broadcast, and row-rule evaluation must
stay inside whole-stage codegen. These helpers parse ``explain`` output so
tests can assert the plan, not just the answer (SURVEY §4.2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    s = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", s):
        body = m.group(1).strip()
        if body:
            out.extend(x.strip() for x in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    s = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Ids of fused codegen stages. Uses 'codegen' explain mode — with AQE
    enabled, Spark 4's simple/formatted modes omit the codegen annotation on
    the not-yet-finalized plan."""
    s = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    n = int(m.group(1)) if m else 0
    return list(range(1, n + 1))
