"""Streaming exact dedup over the arriving document stream.

The batch engine dedups with a fingerprint groupBy (textops/dedup.py:26-51);
on a continuous corpus the same fingerprint becomes streaming state.  The
state-bounding contract matters more than the dedup itself at 10^12 scale:
an unbounded ``dropDuplicates`` keeps every fingerprint ever seen, so we use
``dropDuplicatesWithinWatermark`` — a duplicate arriving within the
watermark horizon is dropped, fingerprints older than the horizon are
evicted from state.  Crawl re-fetch duplicates cluster in time, so a
horizon of hours catches them while state stays O(arrival rate × horizon).

The fingerprint is computed JVM-side from the reassembled span text with
the same md5(lower+whitespace-collapse) canonicalization *recipe* as the
batch operator (textops/dedup.py:34) and its DuckDB oracle.  The inputs
differ by design: batch fingerprints a plain ``text`` column, streaming
fingerprints the raw reassembled document (markup included) because the
stream arrives pre-extraction — two docs identical in text but differing
in markup are batch-duplicates but not stream-duplicates.  To dedup
streams on *extracted* text, run extraction in ``foreachBatch`` first and
feed the result through the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# THE span-reassembly expression (one definition — it is the
# canonicalization contract between streaming and batch fingerprints)
# and THE fingerprint whitespace class, both shared with the batch side.
from ..spark.extract import _HTML_EXPR as _FLAT_EXPR
from ..textops.dedup import WS_RX


def fingerprint_stream(documents_stream: DataFrame) -> DataFrame:
    """Add ``ingest_ts`` (arrival time) and ``fp`` (content fingerprint,
    batch-identical canonicalization) to a streaming documents frame."""
    return documents_stream.withColumn(
        "ingest_ts", F.current_timestamp()
    ).withColumn(
        "fp",
        F.md5(F.regexp_replace(F.lower(F.expr(_FLAT_EXPR)), WS_RX, " ")),
    )


def streaming_exact_dedup(
    documents_stream: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """documents stream → the same stream minus content duplicates seen
    within ``horizon``.  State per key is dropped once the watermark passes
    it, so memory is bounded by (arrival rate × horizon), not corpus size."""
    return (
        fingerprint_stream(documents_stream)
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["fp"])
    )
