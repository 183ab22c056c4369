"""Event-time windowed aggregation with watermarked late-data handling.

The reference is strictly batch; this is the Structured Streaming face of
``plans/relational.py:hourly_event_rollup`` — the same (window,
event_type) → (count, exact-decimal sum) aggregation, computed over a
continuously-arriving event stream:

- ``withWatermark`` bounds state: a window's aggregation state is freed
  once the watermark (max event time seen − allowed lateness) passes its
  end, so state is O(active windows × key cardinality), never corpus
  size — the property that matters at 10^12 events.
- Append output mode emits each window exactly once, when it closes;
  events arriving later than the allowed lateness are dropped, not
  double-counted.  Closed windows are therefore final — equal to the
  batch rollup over the same rows (pinned by the two-wave restart test).

``ts`` arrives TIMESTAMP_NTZ from parquet (Spark 4 reads parquet
timestamps as NTZ; session TZ is UTC) and is cast to TIMESTAMP for the
watermark clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
    " event_type STRING, value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def keyed_windowed_rollup(
    events: DataFrame,
    key: str,
    window: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Shared tumbling-rollup core: (hour, <key>, n_events, sum_value)
    over (ts, <key>, value) rows — stream (watermarked) or batch.  ONE
    definition of the bit-exactness-critical decimal(18,4) sum shape,
    consumed by both ``windowed_event_rollup`` (key=event_type) and
    ``enrich.enriched_segment_rollup`` (key=segment) so the stream /
    batch-twin / DuckDB-oracle parity gates can never drift apart."""
    rows = events.select(
        F.col("ts").cast("timestamp").alias("ts"), key, "value"
    )
    if rows.isStreaming:
        rows = rows.withWatermark("ts", lateness)
    return (
        rows.groupBy(F.window("ts", window).alias("w"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), key, "n_events", "sum_value")
    )


def windowed_event_rollup(
    events_stream: DataFrame,
    window: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time rollup: (hour, event_type, n_events, sum_value)
    — column-for-column the batch ``hourly_event_rollup`` shape, with the
    same decimal(18,4) sum so closed windows match it exactly."""
    return keyed_windowed_rollup(events_stream, "event_type", window, lateness)
