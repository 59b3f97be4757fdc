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


def _bt(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def stat_agg_exprs(
    df: DataFrame,
    profiles: list[ColumnProfile],
    quantiles: tuple[float, ...] = (0.5, 0.95),
    quantile_accuracy: int = 1000,
) -> list:
    """Aggregate expressions for a stats profile — exposed separately so
    ConstraintSuite can fold them into its pass-1 scan (ONE scan computes
    rule fail-counts AND column stats).

    Built as SQL text (one parsed F.expr per aggregate): profiling 5
    columns is ~35 py4j round-trips instead of several hundred Column
    calls — plan construction is driver-serial at both ends of a scaling
    run, so it is sized like any other phase."""
    by_type = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for p in profiles:
        dt = by_type[p.column]
        c = _bt(p.column)
        if isinstance(dt, NUMERIC_TYPES):
            num = f"CAST({c} AS DOUBLE)"
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            num = f"CAST(CAST({c} AS TIMESTAMP) AS DOUBLE)"
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            num = f"CAST(length({c}) AS DOUBLE)"
        elif isinstance(dt, T.ArrayType):
            num = f"CAST(size({c}) AS DOUBLE)"
        else:
            num = "CAST(NULL AS DOUBLE)"
        n = p.column
        # binary min/max as raw bytes would produce non-UTF8 strings; use lengths
        ordered = f"length({c})" if isinstance(dt, T.BinaryType) else c
        qs = ", ".join(f"CAST('{float(q)!r}' AS DOUBLE)" for q in quantiles)
        aggs += [
            F.expr(f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS {_bt(f'nulls__{n}')}"),
            F.expr(f"CAST(min({ordered}) AS STRING) AS {_bt(f'min__{n}')}"),
            F.expr(f"CAST(max({ordered}) AS STRING) AS {_bt(f'max__{n}')}"),
            F.expr(f"avg({num}) AS {_bt(f'mean__{n}')}"),
            F.expr(f"stddev_samp({num}) AS {_bt(f'stddev__{n}')}"),
            F.expr(
                f"percentile_approx({num}, array({qs}), {int(quantile_accuracy)})"
                f" AS {_bt(f'q__{n}')}"
            ),
        ]
        if p.distinct:
            # hll_sketch_agg accepts int/bigint/string/binary only
            if isinstance(dt, (T.StringType, T.BinaryType, T.IntegerType, T.LongType)):
                sk_src = c
            else:
                sk_src = f"CAST({c} AS STRING)"
            aggs.append(F.expr(f"hll_sketch_agg({sk_src}, 14) AS {_bt(f'hll__{n}')}"))
    return aggs


def unpivot_stats(
    wide: DataFrame,
    profiles: list[ColumnProfile],
    quantiles: tuple[float, ...] = (0.5, 0.95),
    include_sketches: bool = False,
) -> DataFrame:
    """Long-format stats from a (cached) wide agg row. Pure projections —
    no extra scan of the source table.

    ONE ``stack`` generator unpivots every profiled column in a single
    projection: no per-column select + unionByName chain (which re-analyzed
    a growing plan per column — O(n²) driver time) and no Union node at
    runtime."""
    names = ["column", "dtype", "nulls", "null_rate", "min", "max", "mean", "stddev"]
    names += [f"p{int(q * 100)}" for q in quantiles]
    names.append("approx_distinct")
    if include_sketches:
        names.append("hll_sketch_b64")

    def _q(s: str) -> str:
        # backslashes first: \ is an escape in Spark SQL string literals
        # (ADVICE r5 #4 — same fix as rules/drift._sql_str)
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    tuples = []
    for p in profiles:
        n = p.column
        nulls, q_arr, hll = _bt(f"nulls__{n}"), _bt(f"q__{n}"), _bt(f"hll__{n}")
        row = [
            _q(n),
            _q(p.dtype),
            f"CAST({nulls} AS BIGINT)",
            f"{nulls} / rows",
            _bt(f"min__{n}"),
            _bt(f"max__{n}"),
            _bt(f"mean__{n}"),
            _bt(f"stddev__{n}"),
        ]
        row += [f"{q_arr}[{i}]" for i in range(len(quantiles))]
        row.append(f"CAST(hll_sketch_estimate({hll}) AS BIGINT)")
        if include_sketches:
            row.append(f"base64({hll})")
        tuples.append(", ".join(row))

    stacked = wide.selectExpr(
        "partition",
        "CAST(rows AS BIGINT) AS rows",
        f"stack({len(profiles)}, {', '.join(tuples)}) AS ({', '.join(names)})",
    )
    return stacked.select("partition", *names[:2], "rows", *names[2:])


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
