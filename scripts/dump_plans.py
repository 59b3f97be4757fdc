#!/usr/bin/env python3
"""Dump .explain('formatted') for declared queries to text files.

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX [query ...]

Runs against $SF (default /root/testdata/sf0.01). Writes
OUT_DIR/<query>_<SUFFIX>.txt for each query (all HEADLINE-style queries by
default). Used to produce the plans/r06/*_before.txt / *_after.txt evidence
the optimization round requires.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em
from slower_whisper_spark.session import get_spark

DEFAULT = [
    "pricing_summary",
    "refint_counts",
    "stats_profile",
    "verdict_rollup",
    "sessionize",
    "dedup_exact",
    "minhash_neardup",
    "ann_bruteforce",
    "token_counts",
    "drift_histogram",
    "quality_filter",
    "paragraph_dedup",
    "contamination",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf = os.environ.get("SF", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not declared")
            continue
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
