from slower_whisper_spark.sources.catalog import read, snapshot_id, list_partitions
