"""Table source shim: partitioned Parquet with Iceberg-like snapshot ids.

The engine's design target is an Iceberg catalog (snapshot reads, partition
pruning from table metadata, schema evolution). The sandbox has no Iceberg
runtime jar, so this module provides the same *contract* over plain
partitioned Parquet (SURVEY §7.1: "Fall back to plain Parquet + a
manifest-simulated snapshot-id"; checkpoint schema is identical either way):

  * ``snapshot_id(path)``  — deterministic content fingerprint of the data
    files (sorted relpath+size+mtime → sha256[:16]), playing Iceberg's
    snapshot-id role: if any file changes, checkpoints are invalidated.
  * ``list_partitions(path, col)`` — partition values from the directory
    layout (hive-style `col=value`), i.e. from METADATA, not from a scan —
    exactly what Iceberg's manifest gives us for free.
  * ``read(spark, path)``   — partition-pruned reads remain Catalyst's job.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def snapshot_id(path: str) -> str:
    if os.path.isfile(path):
        files = [(os.path.basename(path), os.path.getsize(path))]
    else:
        files = []
        for root, _dirs, names in os.walk(path):
            for n in sorted(names):
                if n.endswith((".parquet", ".orc", ".warc", ".warc.gz")):
                    fp = os.path.join(root, n)
                    files.append((os.path.relpath(fp, path), os.path.getsize(fp)))
        files.sort()
    h = hashlib.sha256(repr(files).encode()).hexdigest()
    return h[:16]


def list_partitions(path: str, partition_col: str) -> list[str]:
    """Hive-layout partition values WITHOUT scanning data (metadata-only,
    like an Iceberg partition manifest)."""
    vals = []
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return []
    for name in sorted(os.listdir(path)):
        if name.startswith(prefix) and os.path.isdir(os.path.join(path, name)):
            vals.append(name[len(prefix):])
    return vals


def partition_snapshots(path: str, partition_col: str) -> dict[str, str]:
    """Per-PARTITION content fingerprints (metadata-only) — the incremental-
    validation primitive: on an append-mostly table, a global snapshot id
    changes on EVERY append and forces full re-validation; per-partition
    snapshots let the runner re-validate only partitions whose data files
    actually changed (Iceberg analog: per-partition manifest entries)."""
    out = {}
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return out
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        if name.startswith(prefix) and os.path.isdir(sub):
            out[name[len(prefix):]] = snapshot_id(sub)
    return out


def read(spark: SparkSession, path: str, *, merge_schema: bool = True) -> DataFrame:
    """Table scan with schema evolution ON by default: an append-mostly
    webtext table grows columns over crawls (the Iceberg add-column
    contract), and per-file footers may disagree — ``mergeSchema`` unions
    them (missing columns read as NULL in old partitions, so NotNull rules
    on new columns localize exactly to pre-evolution data). The merge
    reads footers only, not data; pass ``merge_schema=False`` to pin the
    first-footer schema on petabyte file counts where even footer listing
    is budgeted."""
    return spark.read.option("mergeSchema", str(bool(merge_schema)).lower()).parquet(path)
