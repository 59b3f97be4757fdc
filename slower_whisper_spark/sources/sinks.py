"""Result sinks — the engine's analog of the reference's writer family.

The reference serializes one document to JSON/TXT/SRT/CSV/VTT
(ref: transcription/writers.py:62-230, exporters.py:66-201). The engine's
documents are verdict/violation/stats TABLES, so sinks are formatted
projections + distributed writes:

  S3 json   → df.write.json            (canonical machine-readable)
  S4 txt    → formatted text lines     (human-readable report)
  S5 srt    → timestamped report lines (HH:MM:SS,mmm formatting preserved)
  S6 csv    → df.write.csv
  S7 parquet→ df.write.parquet         (the VTT/HTML/TextGrid slot: more
                                        structured formats, same pattern)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def srt_timestamp(seconds: Column) -> Column:
    """HH:MM:SS,mmm — the reference's SRT timestamp format
    (ref: transcription/writers.py:211-219 `_fmt_srt_ts`)."""
    total_ms = (seconds * 1000).cast("long")
    h = (total_ms / F.lit(3600_000)).cast("long")
    m = ((total_ms / F.lit(60_000)) % 60).cast("long")
    s = ((total_ms / F.lit(1000)) % 60).cast("long")
    ms = (total_ms % 1000).cast("long")
    return F.format_string("%02d:%02d:%02d,%03d", h, m, s, ms)


def write_violations_report(violations: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Human-readable text report, one violation per line — the shape the
    reference CLI prints (ref: transcription/cli.py:1164-1172 and the
    per-validator message formatter, schema/validator.py:214-240)."""
    lines = violations.select(
        F.format_string(
            "[viol] %s: key=%s observed=%s expected=%s",
            F.col("rule_id"),
            F.col("key"),
            F.col("observed"),
            F.col("expected"),
        ).alias("value")
    )
    lines.write.mode(mode).text(path)


def write_verdict_report(verdicts: DataFrame, path: str, mode: str = "overwrite") -> None:
    lines = verdicts.select(
        F.format_string(
            "[%s] partition=%s rule=%s violations=%d/%d (%s; expected %s)",
            F.when(F.col("passed"), F.lit("ok")).otherwise(F.lit("FAIL")),
            F.col("partition"),
            F.col("rule_id"),
            F.col("violations"),
            F.col("rows"),
            F.col("observed"),
            F.col("expected"),
        ).alias("value")
    )
    lines.write.mode(mode).text(path)
