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


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """Pin dropDuplicatesWithinWatermark semantics for the bounded-state
    dedup library surface (streaming/windows.dedup_within_watermark):
    a duplicate arriving within the watermark horizon of the first event
    is dropped; once the watermark passes (event_time + delay) the state
    entry is evicted and a later recurrence of the SAME key is emitted as
    a new event — unlike dropDuplicates, whose state (and suppression)
    is forever."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_parquet_parser_spark.streaming.windows import (
        dedup_within_watermark,
        run_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1)

    def write(name, rows, mtime):
        table = pa.table(
            {
                "key": pa.array([r[0] for r in rows]),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(table, p)
        os.utime(p, (mtime, mtime))
        return p

    base = 1_700_000_000
    # batch 1: A first + A dup 10 min later (inside the 1 h horizon) + B
    write("f1.parquet", [("A", t0), ("A", t0 + dt.timedelta(minutes=10)), ("B", t0)], base)
    # batch 2: C far in the future — the NEXT batch's watermark jumps to
    # (10 h − 1 h) = 9 h, far past A's (event_time + delay) expiry
    write("f2.parquet", [("C", t0 + dt.timedelta(hours=10))], base + 1)
    # batch 3: runs with watermark 9 h → A and B are evicted at the END
    # of this batch (state eviction lags one batch behind the watermark
    # jump: a recurrence in THIS batch would still be suppressed — the
    # "may also drop events beyond the horizon" side of the contract)
    write("f3.parquet", [("D", t0 + dt.timedelta(hours=10, minutes=30))], base + 2)
    # batch 4: A recurs after the horizon, state entry gone → re-emitted
    write("f4.parquet", [("A", t0 + dt.timedelta(hours=12))], base + 3)

    schema = spark.read.parquet(str(tmp_path)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    out = run_to_memory(
        dedup_within_watermark(stream, ["key"], "ts", "1 hour"), "append"
    )
    got = sorted((r["key"], r["ts"]) for r in out.collect())
    assert got == sorted(
        [
            ("A", t0),
            ("B", t0),
            ("C", t0 + dt.timedelta(hours=10)),
            ("D", t0 + dt.timedelta(hours=10, minutes=30)),
            ("A", t0 + dt.timedelta(hours=12)),  # re-emitted post-horizon
        ]
    ), got
