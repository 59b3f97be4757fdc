"""Shared Spark fixtures.

Mirrors the reference's hermetic-test philosophy (ref: tests/conftest.py:28-90
mocks heavyweight deps): everything runs on a local[*] session with a
deterministic seed; no external services.
"""

from __future__ import annotations

import pytest

from slower_whisper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sws-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g", "spark.sql.warehouse.dir": "/tmp/sws-warehouse"},
    )
    yield s


@pytest.fixture(scope="session")
def docs_small(spark):
    """10^4-row deterministic webtext table + expected/ref tables (seed 42)."""
    from slower_whisper_spark.datagen import generate_docs

    docs, expected, ref = generate_docs(10_000, seed=42)
    sdf = spark.createDataFrame(docs)
    from pyspark.sql import functions as F

    sdf = sdf.withColumn("warc_day", F.to_date("warc_ts")).cache()
    edf = spark.createDataFrame(expected).cache()
    rdf = spark.createDataFrame(ref).cache()
    sdf.count(), edf.count(), rdf.count()
    return sdf, edf, rdf


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tpch(spark):
    """Driver-provided TPC-H-ish tables at sf0.001."""

    def load(name):
        return spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    return {
        n: load(n)
        for n in [
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        ]
    }
