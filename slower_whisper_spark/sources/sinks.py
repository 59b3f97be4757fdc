"""Result sinks — the engine's analog of the reference's writer family.

The reference serializes one document to JSON/TXT/SRT/CSV/VTT/HTML/TextGrid
(ref: transcription/writers.py:62-230, exporters.py:66-201). The engine's
documents are verdict/violation/stats TABLES, so sinks are formatted
projections + distributed writes:

  S3 json     → df.write.json          (canonical machine-readable)
  S4 txt      → formatted text lines   (human-readable report)
  S5 srt      → timestamped report lines (HH:MM:SS,mmm formatting preserved)
  S6 csv      → df.write.csv
  S7 vtt/html/textgrid → per-document payloads assembled DISTRIBUTED from a
     segments table (key, start, end, text) with collect_list + array HOFs —
     one output row per document, zero driver-side string building; plus
     df.write.parquet for the structured slot.
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


def vtt_timestamp(seconds: Column) -> Column:
    """HH:MM:SS.mmm (WebVTT uses a dot; ref: transcription/exporters.py)."""
    total_ms = (seconds * 1000).cast("long")
    h = (total_ms / F.lit(3600_000)).cast("long")
    m = ((total_ms / F.lit(60_000)) % 60).cast("long")
    s = ((total_ms / F.lit(1000)) % 60).cast("long")
    ms = (total_ms % 1000).cast("long")
    return F.format_string("%02d:%02d:%02d.%03d", h, m, s, ms)


def _segments_sorted(
    df: DataFrame, key_col: str, start_col: str, end_col: str, text_col: str
) -> DataFrame:
    """(key, segs) with segs = time-ordered array<struct<s,e,t>> — the
    shared per-document assembly for the S7 exporters. One shuffle on the
    document key; everything after is array HOFs."""
    seg = F.struct(
        F.col(start_col).cast("double").alias("s"),
        F.col(end_col).cast("double").alias("e"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("t"),
    )
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.sort_array(F.collect_list(seg)).alias("segs"))
    )


def _html_escape(c: Column) -> Column:
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def format_vtt(
    df: DataFrame, *, key_col: str, start_col: str, end_col: str, text_col: str
) -> DataFrame:
    """(key, payload): a complete WEBVTT document per key
    (ref: transcription/exporters.py VTT cue format)."""
    g = _segments_sorted(df, key_col, start_col, end_col, text_col)
    cue = lambda x: F.concat(
        vtt_timestamp(x["s"]), F.lit(" --> "), vtt_timestamp(x["e"]), F.lit("\n"), x["t"]
    )
    body = F.array_join(F.transform(F.col("segs"), cue), "\n\n")
    return g.select("key", F.concat(F.lit("WEBVTT\n\n"), body, F.lit("\n")).alias("payload"))


def format_html(
    df: DataFrame, *, key_col: str, start_col: str, end_col: str, text_col: str
) -> DataFrame:
    """(key, payload): minimal HTML transcript, one <p> per segment with
    data-start/data-end attributes, text HTML-escaped."""
    g = _segments_sorted(df, key_col, start_col, end_col, text_col)
    para = lambda x: F.format_string(
        '  <p data-start="%.3f" data-end="%.3f">%s</p>', x["s"], x["e"], _html_escape(x["t"])
    )
    body = F.array_join(F.transform(F.col("segs"), para), "\n")
    payload = F.concat(
        F.lit("<!DOCTYPE html>\n<html><body>\n<article class=\"transcript\" id=\""),
        _html_escape(F.col("key").cast("string")),
        F.lit("\">\n"),
        body,
        F.lit("\n</article>\n</body></html>\n"),
    )
    return g.select("key", payload.alias("payload"))


def format_textgrid(
    df: DataFrame, *, key_col: str, start_col: str, end_col: str, text_col: str,
    tier_name: str = "transcript",
) -> DataFrame:
    """(key, payload): Praat ooTextFile TextGrid with one IntervalTier
    (ref TextGrid exporter: transcription/exporters.py)."""
    g = _segments_sorted(df, key_col, start_col, end_col, text_col)
    n = F.size("segs")
    xmax = F.element_at(F.col("segs"), -1)["e"]

    def interval(x, i):
        quoted = F.regexp_replace(x["t"], '"', '""')
        return F.format_string(
            '        intervals [%d]:\n            xmin = %.3f\n            xmax = %.3f\n            text = "%s"',
            i + 1, x["s"], x["e"], quoted,
        )

    body = F.array_join(F.zip_with(F.col("segs"), F.sequence(F.lit(0), n - 1), interval), "\n")
    header = F.format_string(
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\nxmin = 0\nxmax = %.3f\n'
        "tiers? <exists>\nsize = 1\nitem []:\n    item [1]:\n"
        '        class = "IntervalTier"\n        name = "%s"\n'
        "        xmin = 0\n        xmax = %.3f\n        intervals: size = %d",
        xmax, F.lit(tier_name), xmax, n,
    )
    return g.select("key", F.concat(header, F.lit("\n"), body, F.lit("\n")).alias("payload"))


def write_per_doc_text(formatted: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (key, payload) rows as text, one directory per key — the
    distributed analog of the reference's one-file-per-document writers."""
    formatted.select("key", F.col("payload").alias("value")).write.mode(mode).partitionBy(
        "key"
    ).text(path)


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
