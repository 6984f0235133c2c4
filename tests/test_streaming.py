"""Structured Streaming: batch equivalence + watermark append semantics +
custom stateful sessionization (multi-microbatch, flush-to-close)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.operators.windows import (
    q_stream_session,
    q_stream_tumbling,
)
from duckdb_parquet_parser_spark.streaming.stateful import streaming_sessionize
from duckdb_parquet_parser_spark.streaming.windows import (
    streaming_tumbling,
    streaming_tumbling_append,
)
from duckdb_parquet_parser_spark.testing import canonical_hash


def _hash(df):
    return canonical_hash(df.toPandas())


def test_streaming_tumbling_equals_batch(spark, sf_smoke):
    assert _hash(streaming_tumbling(spark, sf_smoke)) == _hash(
        q_stream_tumbling(spark, sf_smoke)
    )


def test_streaming_append_emits_closed_windows_only(spark, sf_smoke):
    emitted = streaming_tumbling_append(spark, sf_smoke, watermark="6 hours")
    batch = q_stream_tumbling(spark, sf_smoke)
    # append mode: a window emits iff final watermark passed its end;
    # watermark is data-driven, so just assert a proper nonempty subset
    # that is exact on the windows it does emit
    n_emit, n_batch = emitted.count(), batch.count()
    assert 0 < n_emit < n_batch
    joined = emitted.alias("e").join(
        batch.alias("b"), ["window_start", "event_type"]
    )
    assert joined.count() == n_emit
    mismatches = joined.filter(
        (F.col("e.n") != F.col("b.n"))
        | (F.col("e.sum_value") != F.col("b.sum_value"))
    )
    assert mismatches.count() == 0
    # every skipped window is at the tail (newer than every emitted one)
    max_emitted = emitted.agg(F.max("window_start")).collect()[0][0]
    skipped = batch.join(emitted, ["window_start", "event_type"], "left_anti")
    older_skipped = skipped.filter(F.col("window_start") < max_emitted)
    assert older_skipped.count() == 0


def test_rocksdb_state_store_equals_batch(spark, sf_smoke):
    """The 100 TB state-store config (SURVEY §8.1): the RocksDB provider —
    the production choice once state outgrows executor heap — produces the
    same finished aggregation as the default HDFS-backed provider and the
    batch plan. Provider class is bound at stream start, so setting the
    conf around the run is the whole integration."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(
        key,
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        streamed = _hash(streaming_tumbling(spark, sf_smoke))
    finally:
        spark.conf.set(key, old)
    assert streamed == _hash(q_stream_tumbling(spark, sf_smoke))


def test_stateful_sessionize_equals_batch(spark, sf_smoke):
    assert _hash(streaming_sessionize(spark, sf_smoke)) == _hash(
        q_stream_session(spark, sf_smoke)
    )


def test_watermark_sessionize_emits_without_flush(spark, sf_smoke):
    """EventTimeTimeout eviction: sessions emit once the watermark passes
    their close — no flush sentinel anywhere in the stream. Emitted rows
    must be a nonempty proper subset of the batch answer, exact on every
    field (the staged source is ts-range-partitioned, so no future event
    can bridge an emitted session)."""
    from duckdb_parquet_parser_spark.streaming.stateful import (
        streaming_sessionize_watermark,
    )

    emitted = streaming_sessionize_watermark(spark, sf_smoke)
    batch = q_stream_session(spark, sf_smoke)
    n_emit, n_batch = emitted.count(), batch.count()
    assert 0 < n_emit < n_batch, (n_emit, n_batch)
    assert emitted.distinct().count() == n_emit
    joined = emitted.alias("e").join(batch.alias("b"), ["user_id", "session_start"])
    assert joined.count() == n_emit
    bad = joined.filter(
        (F.col("e.n_events") != F.col("b.n_events"))
        | (F.col("e.session_end") != F.col("b.session_end"))
        | (F.abs(F.col("e.session_value") - F.col("b.session_value")) > 1e-9)
    )
    assert bad.count() == 0
