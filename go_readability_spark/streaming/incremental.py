"""Incremental (Structured Streaming) extraction.

The reference is strictly batch (SURVEY.md §2.9), and the production design
favors Iceberg incremental reads; this module provides the Structured
Streaming face for continuously-arriving corpora: a file-source stream of
documents(doc_id, spans[, uri]) → the same ``extract_articles`` operator via
``foreachBatch`` → append sink + streaming metrics.

Why foreachBatch rather than a streaming mapInPandas: the extraction kernel
is stateless per document, so each micro-batch is just a bounded batch job —
foreachBatch reuses the exact batch operator (identical semantics, one code
path) and gets exactly-once from checkpointed offsets + a per-batch
dynamic-partition-overwrite sink (a retried batch replaces its own
``batch_id=`` partition; plain append would duplicate on retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..kernel.options import Options
from ..spark.extract import extract_articles
from ..spark.schema import DOCUMENTS_SCHEMA


def read_document_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def start_incremental_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    options: Options | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream → kernel extraction → parquet append, checkpointed.

    ``available_now=True`` drains everything currently present then stops
    (the batch-catchup trigger); ``False`` runs continuously.  Restart with
    the same checkpoint resumes from the recorded offsets — the streaming
    twin of the lineage-table resume.
    """
    stream = read_document_stream(spark, input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent per micro-batch: results land in a batch_id= partition
        # via dynamic partition overwrite, so a retried batch REPLACES its
        # own partial output instead of appending duplicates — this plus
        # the checkpointed offsets is what makes the sink exactly-once.
        # Enforced here: under the default static mode this overwrite would
        # truncate ALL earlier batches' partitions.
        batch_df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        extract_articles(batch_df, options).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").partitionBy("batch_id").parquet(output_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_arrival_metrics(
    documents_stream: DataFrame, window: str = "1 minute"
) -> DataFrame:
    """Windowed streaming aggregation over the arriving corpus: doc counts
    and total span bytes per processing-time window — the streaming face of
    the extraction_metrics table.  Watermark bounds state for late files."""
    with_ts = documents_stream.withColumn("ingest_ts", F.current_timestamp())
    return (
        with_ts.withWatermark("ingest_ts", "2 minutes")
        .groupBy(F.window("ingest_ts", window).alias("win"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.expr("aggregate(spans, 0L, (acc, s) -> acc + coalesce(length(s.text), 0L))")
            ).alias("total_bytes"),
        )
        .select("win.start", "win.end", "n_docs", "total_bytes")
    )
