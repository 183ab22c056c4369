"""Stream-static enrichment join: a live event stream joined to a small
static dimension, then rolled up per enrichment key.

The fourth core Structured Streaming pattern in this engine (after
foreachBatch incremental extraction, watermarked dedup/windows, and the
custom stateful sessionizer): a stateless stream-static join.  Spark
plans the static side as a broadcast against every micro-batch, so the
join adds NO streaming state — only the downstream windowed aggregate
holds state, bounded by the watermark exactly as in ``windows.py``.

No reference equivalent (the reference has no streaming surface at
all); the BATCH twin — same join + same decimal-exact rollup over the
parquet events table — is the registry query ``events_segment_rollup``
with a DuckDB oracle, and the test asserts an availableNow run of this
stream equals it row-for-row (append mode emits only watermark-closed
windows, so the test bounds lateness below the data's span).

Scale shape: dimension tables that fit on one executor broadcast (the
Catalyst default under AQE for a sub-threshold static side); a dim too
large to broadcast becomes a shuffled stream-static join, still
stateless.  readability citation: none — corpus-pipeline tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def segment_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static (user_id, segment) dimension from the customer table —
    the broadcast side of the stream-static join."""
    return (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


def enriched_segment_rollup(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """events (stream or batch) ⋈ static dim → tumbling (hour, segment)
    rollup: (hour, segment, n_events, sum_value), via the shared
    ``windows.keyed_windowed_rollup`` core (one definition of the
    decimal-exact sum shape).  No explicit broadcast hint: Catalyst
    broadcasts a sub-threshold static side on its own, and an oversized
    dim then degrades to the shuffled stream-static join instead of
    force-building an over-memory broadcast."""
    from .windows import keyed_windowed_rollup

    joined = events.select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    ).join(dim, "user_id")
    return keyed_windowed_rollup(joined, "segment", window, lateness)


def events_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming enrichment rollup (registry query)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return enriched_segment_rollup(ev, segment_dim(spark, sf_dir)).orderBy(
        "hour", "segment"
    )


def events_segment_rollup_oracle_sql() -> str:
    return """
SELECT date_trunc('hour', e.ts) AS hour, c.c_mktsegment AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY hour, segment
"""
