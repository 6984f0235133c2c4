"""Structured-Streaming window aggregations over the events stream.

The aggregation *expressions* are shared with the batch module
(``operators.windows``) — streaming-batch equivalence is the Structured
Streaming contract, and the tests assert it: the streaming result (memory
sink, after ``processAllAvailable``) hash-matches the batch result and
therefore the same DuckDB oracle.

Two regimes:

- equivalence runs use ``complete`` output mode (no windows dropped, the
  final memory table is the full aggregation — equal to the batch result);
- the watermark/append run uses a short watermark and asserts append-mode
  semantics: a window emits exactly once, when the watermark (max seen
  event time − delay) passes its end — late windows stay open and never
  reach the sink.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.windows import sliding_agg, tumbling_agg
from .source import event_stream, stage_events


def run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink; return
    the sink contents as a (batch) DataFrame. The checkpoint is scratch
    for a finished run — reclaimed on exit (the memory table is unaffected).
    """
    name = f"s{uuid.uuid4().hex[:12]}"
    ckpt = f"/tmp/spark_graft_streaming/ckpt/{name}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-mode tumbling aggregation — batch-equivalent final state."""
    src = event_stream(spark, stage_events(spark, sf_dir))
    return run_to_memory(tumbling_agg(src), "complete")


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = event_stream(spark, stage_events(spark, sf_dir))
    return run_to_memory(sliding_agg(src), "complete")


def streaming_tumbling_append(
    spark: SparkSession, sf_dir: str, watermark: str = "6 hours"
) -> DataFrame:
    """Append-mode with a real watermark: only windows whose end < final
    watermark are emitted (the late-data-discard regime).

    Watermarks are only legal on TIMESTAMP (not NTZ); the session timezone
    is UTC, so the round-trip cast is value-preserving.
    """
    from pyspark.sql import functions as F

    src = event_stream(spark, stage_events(spark, sf_dir)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = tumbling_agg(src.withWatermark("ts", watermark)).withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )
    return run_to_memory(out, "append")


def q_streaming_tumbling_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_tumbling(spark, sf_dir)


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: ``dropDuplicates`` over the event
    stream keeps the FIRST arrival of each (user_id, event_type) across
    every microbatch (state-backed — the streaming half of the dedup
    story in §2.5). Projected to the key, the finished stream equals
    batch DISTINCT, which is the oracle. State is unbounded by design
    here; the bounded-state variant is ``dropDuplicatesWithinWatermark``
    when keys can expire."""
    src = event_stream(spark, stage_events(spark, sf_dir))
    dd = src.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(dd, "append")


QUERIES = {
    "streaming_tumbling_rt": q_streaming_tumbling_rt,
    "streaming_dedup": q_streaming_dedup,
}

# Streaming-batch equivalence: the finished stream equals the batch window
# aggregation, so it shares the batch oracle (operators.windows).
from ..operators.windows import ORACLES as _BATCH_ORACLES  # noqa: E402

ORACLES = {
    "streaming_tumbling_rt": _BATCH_ORACLES["stream_tumbling"],
    "streaming_dedup": "SELECT DISTINCT user_id, event_type FROM events",
}
