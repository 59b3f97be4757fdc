#!/usr/bin/env python3
"""Extra benchmarks that are NOT part of the frozen driver contract
(bench.py). Prints one JSON line.

- graph leg (VERDICT r5 #9): host_rank + host_centrality declared queries
  over the generated webtext host graph at $SPARK_GRAFT_SF_DIR — the one
  operator family with no throughput number in bench.py.
- noop-isolated minhash stages (guide §1.4): signatures / candidates /
  verified pairs, so stage-level regressions are attributable without the
  count() sink.

Methodology matches bench.py: local[$SPARK_GRAFT_CPUS], warm = best of 2
after a cold run, same session settings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = os.environ.get("SWS_BENCH_MASTER", f"local[{cpus}]")

    import __spark_entry__ as em
    from slower_whisper_spark.session import get_spark

    spark = get_spark(
        app_name="sws-bench-extra",
        master=master,
        shuffle_partitions=int(os.environ.get("SWS_BENCH_SHUFFLE", "64")),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get("SWS_BENCH_MPB", "32m")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    out: dict = {"metric": "bench_extra", "sf_dir": sf_dir, "master": master}

    def warm(name: str, fn) -> float:
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 3))
        out[f"{name}_cold_sec"] = times[0]
        return min(times[1:])

    # --- graph leg ----------------------------------------------------- #
    spark.sparkContext.setJobDescription("bench_extra: host_rank")
    out["host_rank_warm_sec"] = warm(
        "host_rank", lambda: qs["host_rank"](spark, sf_dir).count()
    )
    spark.sparkContext.setJobDescription("bench_extra: host_centrality")
    out["host_centrality_warm_sec"] = warm(
        "host_centrality", lambda: qs["host_centrality"](spark, sf_dir).count()
    )

    # --- noop-isolated minhash stages ---------------------------------- #
    from pyspark.sql import functions as F

    from slower_whisper_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
        minhash_signatures_df,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("bench_extra: minhash signatures")
    out["minhash_signatures_warm_sec"] = warm(
        "minhash_signatures",
        lambda: noop(minhash_signatures_df(docs, "text", "doc_id", 64, 3)),
    )
    spark.sparkContext.setJobDescription("bench_extra: minhash candidates")
    out["minhash_candidates_warm_sec"] = warm(
        "minhash_candidates",
        lambda: noop(
            minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=64, bands=16)
        ),
    )
    spark.sparkContext.setJobDescription("bench_extra: minhash verified pairs")

    def pairs():
        cand = minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=64, bands=16)
        noop(
            jaccard_pairs(
                docs, "text", "doc_id", threshold=0.8, candidates=cand, hashed_shingles=True
            )
        )

    out["minhash_pairs_warm_sec"] = warm("minhash_pairs", pairs)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
