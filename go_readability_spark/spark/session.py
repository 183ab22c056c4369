"""Session builder with the engine's standard configs.

Tuned for the extraction workload (SURVEY.md §4.2): AQE on (runtime
coalescing + skew splitting), Arrow on with a small max batch so one
mega-document cannot co-batch with hundreds of peers, and dynamic
partition overwrite so per-bucket re-runs are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 64


def build_session(
    cpus: int | None = None,
    app_name: str = "go_readability_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # articles/documents tables are scan-bound at corpus scale; zstd
        # cuts bytes-on-disk ~1.5-2x vs snappy at comparable decode cost
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # extraction at high parallelism is allocation-heavy (arrow buffers
        # per concurrent task); a larger heap measurably reduces GC stalls
        # (local[16]: 2637 -> 2954 docs/s from 8g -> 24g alone)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
