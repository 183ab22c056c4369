"""Stream-stream interval join: click attribution against a view stream.

The last of the five Structured Streaming patterns this engine ships
(foreachBatch incremental extraction, watermarked dedup, custom stateful
sessionizer, watermarked windows + stream-static enrichment, and now a
stateful STREAM-STREAM join).  Two live streams join on user with an
event-time range condition — the classic ad-attribution shape: every
click within ``horizon`` after a view by the same user is an attributed
pair.

State boundedness (the 100 TB concern): both sides carry watermarks and
the join condition bounds ``click_ts`` to ``[view_ts, view_ts +
horizon]``, so Spark can expire buffered rows once the watermark passes
their last possible match — state is O(arrival rate × (horizon +
lateness)), never the full history.  An inner join emits each pair as
soon as both sides have arrived (no window close needed).

No reference equivalent (no streaming surface in the reference).  The
batch twin ``view_click_attribution_rollup`` — the same range join over
the parquet events table, rolled up per view-hour — is a registry query
whose DuckDB oracle runs the identical inequality join (IEJoin
physical); the streaming test asserts the drained pair set equals the
batch join exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

ATTRIBUTION_HORIZON = "30 minutes"


def view_click_pairs(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    lateness: str = "30 minutes",
) -> DataFrame:
    """(view, click) pairs within ``horizon``: works on two streams (adds
    watermarks so join state expires) or two batch frames (same plan
    minus state).  Returns (user_id, view_id, view_ts, click_id,
    click_ts)."""
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", lateness)
    if c.isStreaming:
        c = c.withWatermark("click_ts", lateness)
    cond = (
        (v.user_id == c.click_user)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= F.expr(f"view_ts + INTERVAL {horizon}"))
    )
    return v.join(c, cond, "inner").select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts"
    )


def view_click_attribution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (registry query): the same interval join over the
    events table, per view-hour — (hour, n_pairs, n_attributed_views)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    pairs = view_click_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )
    return (
        pairs.groupBy(F.date_trunc("hour", F.col("view_ts")).alias("hour"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("view_id").alias("n_attributed_views"),
        )
        .orderBy("hour")
    )


def view_click_attribution_oracle_sql() -> str:
    return """
SELECT date_trunc('hour', v.ts) AS hour,
       count(*) AS n_pairs,
       count(DISTINCT v.event_id) AS n_attributed_views
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
GROUP BY 1
ORDER BY hour
"""
