"""Single-pass per-partition column statistics.

The north star's "column stats via a single vectorized pass": count,
null-rate, min/max, mean/stddev, quantiles, approximate distinct — ALL
columns, ALL partitions, ONE ``groupBy(partition).agg(...)`` job. Catalyst
prunes the Parquet scan to the profiled columns and whole-stage codegen
fuses every aggregate into one loop.

Reference ancestors: per-speaker stats rollups
(ref: transcription/speaker_stats.py:26-102 — sums, medians, categorical
ratios) and the batch verdict rollup (ref: transcription/models.py:384-429).

Distinct counts use Spark's built-in Apache DataSketches HLL
(``hll_sketch_agg``) so the per-partition sketches are MERGEABLE: the same
binary sketches we surface per partition can be unioned (``hll_union_agg``)
into table-level stats, or persisted in the checkpoint manifest and merged
across runs — the property SURVEY §4.2 calls out as missing from plain
``approx_count_distinct``. Quantiles use ``percentile_approx``
(Greenwald-Khanna) in-pass.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class ColumnProfile:
    column: str
    dtype: str
    quantiles: tuple[float, ...] = (0.5, 0.95)
    distinct: bool = True


def _profiles_for(df: DataFrame, columns: list[str] | None) -> list[ColumnProfile]:
    out = []
    for f in df.schema.fields:
        if columns is not None and f.name not in columns:
            continue
        if f.name.startswith("__"):
            continue
        out.append(ColumnProfile(column=f.name, dtype=f.dataType.simpleString()))
    return out


def stat_agg_exprs(
    df: DataFrame,
    profiles: list[ColumnProfile],
    quantiles: tuple[float, ...] = (0.5, 0.95),
    quantile_accuracy: int = 1000,
) -> list:
    """Aggregate expressions for a stats profile — exposed separately so
    ConstraintSuite can fold them into its pass-1 scan (ONE scan computes
    rule fail-counts AND column stats)."""
    by_type = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for p in profiles:
        c = F.col(p.column)
        dt = by_type[p.column]
        if isinstance(dt, NUMERIC_TYPES):
            num = c.cast("double")
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            num = c.cast("timestamp").cast("double")
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            num = F.length(c).cast("double")
        elif isinstance(dt, T.ArrayType):
            num = F.size(c).cast("double")
        else:
            num = F.lit(None).cast("double")
        n = p.column
        # binary min/max as raw bytes would produce non-UTF8 strings; use lengths
        ordered = F.length(c) if isinstance(dt, T.BinaryType) else c
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"nulls__{n}"),
            F.min(ordered).cast("string").alias(f"min__{n}"),
            F.max(ordered).cast("string").alias(f"max__{n}"),
            F.avg(num).alias(f"mean__{n}"),
            F.stddev_samp(num).alias(f"stddev__{n}"),
            F.percentile_approx(num, list(quantiles), quantile_accuracy).alias(f"q__{n}"),
        ]
        if p.distinct:
            # hll_sketch_agg accepts int/bigint/string/binary only
            if isinstance(dt, (T.StringType, T.BinaryType, T.IntegerType, T.LongType)):
                sk_src = c
            else:
                sk_src = c.cast("string")
            aggs.append(F.hll_sketch_agg(sk_src, 14).alias(f"hll__{n}"))
    return aggs


def unpivot_stats(
    wide: DataFrame,
    profiles: list[ColumnProfile],
    quantiles: tuple[float, ...] = (0.5, 0.95),
    include_sketches: bool = False,
) -> DataFrame:
    """Long-format stats from a (cached) wide agg row. Pure projections —
    no extra scan of the source table."""
    parts = []
    for p in profiles:
        n = p.column
        sel = [
            F.col("partition"),
            F.lit(n).alias("column"),
            F.lit(p.dtype).alias("dtype"),
            F.col("rows").cast("long").alias("rows"),
            F.col(f"nulls__{n}").cast("long").alias("nulls"),
            (F.col(f"nulls__{n}") / F.col("rows")).alias("null_rate"),
            F.col(f"min__{n}").alias("min"),
            F.col(f"max__{n}").alias("max"),
            F.col(f"mean__{n}").alias("mean"),
            F.col(f"stddev__{n}").alias("stddev"),
        ]
        for i, q in enumerate(quantiles):
            sel.append(F.col(f"q__{n}")[i].alias(f"p{int(q * 100)}"))
        sel.append(F.hll_sketch_estimate(F.col(f"hll__{n}")).cast("long").alias("approx_distinct"))
        if include_sketches:
            sel.append(F.base64(F.col(f"hll__{n}")).alias("hll_sketch_b64"))
        parts.append(wide.select(*sel))

    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


def profile(
    df: DataFrame,
    *,
    partition_col: str | None = None,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    include_sketches: bool = False,
    quantile_accuracy: int = 1000,
) -> DataFrame:
    """One wide agg → long-format stats table.

    Output: (partition, column, dtype, rows, nulls, null_rate, min, max,
    mean, stddev, p50.., approx_distinct[, hll_sketch_b64]).

    String/binary columns are profiled on their LENGTH for the numeric
    moments (the webtext table's text/html stats are length distributions);
    min/max of strings stay lexical.
    """
    profiles = _profiles_for(df, columns)
    if not profiles:
        raise ValueError("no columns to profile")

    pcol = partition_col or "__all"
    if partition_col is None:
        df = df.withColumn("__all", F.lit("ALL"))

    aggs = [F.count(F.lit(1)).alias("rows")] + stat_agg_exprs(
        df, profiles, quantiles, quantile_accuracy=quantile_accuracy
    )
    wide = df.groupBy(F.col(pcol).cast("string").alias("partition")).agg(*aggs).cache()
    return unpivot_stats(wide, profiles, quantiles, include_sketches)


def merge_partition_sketches(stats_df: DataFrame) -> DataFrame:
    """Merge per-partition HLL sketches into table-level distinct counts —
    proves the sketches are mergeable (the checkpoint-manifest use case)."""
    if "hll_sketch_b64" not in stats_df.columns:
        raise ValueError("profile(...) must be called with include_sketches=True")
    return (
        stats_df.groupBy("column")
        .agg(
            F.sum("rows").alias("rows"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.unbase64(F.col("hll_sketch_b64")))
            ).cast("long").alias("approx_distinct_merged"),
        )
    )


def sketch_to_b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")
