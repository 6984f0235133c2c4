"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the escape hatch for operators Spark's built-in
streaming aggregations can't express — SURVEY.md §2.4 UDF/stateful row).

Semantics match ``operators.windows.session_agg`` (session = maximal event
chain with inter-event gap < GAP; end = last event + gap), so the batch
DuckDB oracle verifies this operator too.

Design for out-of-order, multi-microbatch arrival (the real streaming
regime — the staged source feeds one file per trigger):

- State per user = the list of currently-open sessions, each an aggregate
  ``(start_us, last_us, n, value_sum)``; value_sum is an exact
  micro-units integer (value quantized to 6dp — associative, so batch
  order never changes the result, mirroring the engine-wide
  decimal(18,6) aggregation convention).
- Each arriving event either extends/bridges existing sessions (interval
  merge within ±gap) or opens a new one — bridging two sessions merges
  their aggregates; this is order-independent, so any file/batch arrival
  order converges to the batch answer.
- Emission, two modes:
  * ``flush`` — a sentinel event (``event_type = '__flush__'``) closes and
    emits every open session. Deterministic end-of-stream equality with
    the batch oracle; what the declared query runs.
  * ``watermark`` — ``GroupStateTimeout.EventTimeTimeout``: a session is
    emitted as soon as the event-time watermark passes ``last + gap``
    (either piggybacked on new data for the user, or via a state timeout
    when the user goes quiet). This is the production path — a real
    stream never flushes. Because the staged source is range-partitioned
    by ts (later files ≥ earlier files), an emitted session can never be
    bridged by a future event, so emitted sessions exactly match the
    batch answer; only the still-open tail (last + gap > final watermark)
    stays unemitted.
"""

from __future__ import annotations

import os
import shutil
import uuid
from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.windows import SESSION_GAP_SECONDS
from .source import event_stream, stage_events

GAP_US = SESSION_GAP_SECONDS * 1_000_000
FLUSH = "__flush__"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# open sessions, column-major arrays (state structs must be fixed-shape)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.LongType())),  # micro-units
        T.StructField("max_seen", T.LongType()),
    ]
)


def _micro_units(v: float) -> int:
    """Quantize a double to 6dp micro-units (HALF_UP — the same rounding
    Spark/DuckDB apply casting double → decimal(18,6))."""
    return int(
        Decimal(v).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        .scaleb(6)
    )


def _merge_event(sessions: list[list[int]], ts_us: int, val_us: int) -> None:
    """Insert one event into the open-session list, merging any sessions it
    bridges. A session [start, last] absorbs ts iff
    start - gap ≤ ts ≤ last + gap — INCLUSIVE at exactly gap distance,
    matching Spark's native ``session_window`` (probed: two events 1800 s
    apart merge under a 30-minute gap; 1801 s apart do not), so the
    stateful operator and the batch aggregation agree on tie-heavy data
    (pinned by tests/test_randomized_events.py)."""
    absorbed = [
        s for s in sessions if s[0] - GAP_US <= ts_us <= s[1] + GAP_US
    ]
    rest = [
        s for s in sessions if not (s[0] - GAP_US <= ts_us <= s[1] + GAP_US)
    ]
    if not absorbed:
        rest.append([ts_us, ts_us, 1, val_us])
    else:
        start = min([a[0] for a in absorbed] + [ts_us])
        last = max([a[1] for a in absorbed] + [ts_us])
        n = sum(a[2] for a in absorbed) + 1
        sv = sum(a[3] for a in absorbed) + val_us
        rest.append([start, last, n, sv])
    sessions[:] = sorted(rest)


def _emit(user_id: int, closed: list[list[int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": pd.to_datetime(
                [s[0] for s in closed], unit="us"
            ),
            "session_end": pd.to_datetime(
                [s[1] + GAP_US for s in closed], unit="us"
            ),
            "n_events": [s[2] for s in closed],
            "session_value": [s[3] / 1e6 for s in closed],
        }
    )


def sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        starts, lasts, counts, sums, max_seen = state.get
        sessions = [list(t) for t in zip(starts, lasts, counts, sums)]
    else:
        sessions, max_seen = [], 0
    flush = False
    for pdf in pdfs:
        flushes = pdf["event_type"] == FLUSH
        flush = flush or bool(flushes.any())
        data = pdf[~flushes]
        ts_us = data["ts"].astype("datetime64[us]").astype("int64")
        for t, v in zip(ts_us, data["value"]):
            _merge_event(sessions, int(t), _micro_units(v))
            max_seen = max(max_seen, int(t))
    if flush:
        closed, still_open = sessions, []
    else:
        closed, still_open = [], sessions
    if flush:
        if state.exists:
            state.remove()
    else:
        state.update(
            (
                [s[0] for s in still_open],
                [s[1] for s in still_open],
                [s[2] for s in still_open],
                [s[3] for s in still_open],
                max_seen,
            )
        )
    if closed:
        yield _emit(user_id, sorted(closed))


def sessionize_group_wm(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Watermark-eviction variant: emit every session whose close time
    (last + gap) the watermark has passed; park the rest in state with an
    event-time timeout at the earliest possible close."""
    (user_id,) = key
    if state.exists:
        starts, lasts, counts, sums, max_seen = state.get
        sessions = [list(t) for t in zip(starts, lasts, counts, sums)]
    else:
        sessions, max_seen = [], 0
    for pdf in pdfs:  # drained even on timeout calls (empty iterator then)
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, v in zip(ts_us, pdf["value"]):
            _merge_event(sessions, int(t), _micro_units(v))
            max_seen = max(max_seen, int(t))
    wm_us = state.getCurrentWatermarkMs() * 1000
    # STRICT compare: an on-time event may still arrive at exactly
    # last + gap (ts ≥ watermark is on-time) and must be able to merge,
    # so a session only closes once the watermark has passed that instant
    closed = [s for s in sessions if s[1] + GAP_US < wm_us]
    still_open = [s for s in sessions if s[1] + GAP_US >= wm_us]
    if still_open:
        state.update(
            (
                [s[0] for s in still_open],
                [s[1] for s in still_open],
                [s[2] for s in still_open],
                [s[3] for s in still_open],
                max_seen,
            )
        )
        # +1 ms past the close instant: closing is strict (wm must PASS
        # last + gap), so a timeout at the instant itself would be a no-op
        next_close_ms = min(s[1] + GAP_US for s in still_open) // 1000 + 1
        state.setTimeoutTimestamp(
            max(next_close_ms, state.getCurrentWatermarkMs() + 1)
        )
    elif state.exists:
        state.remove()
    if closed:
        yield _emit(user_id, sorted(closed))


def sessionize_stream(events: DataFrame, mode: str = "flush") -> DataFrame:
    if mode == "watermark":
        # watermarks reject TIMESTAMP_NTZ — cast to timestamp (session tz
        # is UTC, value-preserving); _emit re-builds ntz bounds
        ev = (
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "30 seconds")
            .select("user_id", "ts", "value")
        )
        return ev.groupBy("user_id").applyInPandasWithState(
            sessionize_group_wm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return events.groupBy("user_id").applyInPandasWithState(
        sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the staged multi-file stream to
    completion (with a final flush batch), return the emitted sessions."""
    staged = stage_events(spark, sf_dir)
    # private copy + flush file: the sentinel advances every user past
    # their last session without contributing events
    run_dir = f"/tmp/spark_graft_streaming/run/{uuid.uuid4().hex[:12]}"
    shutil.copytree(staged, f"{run_dir}/data")
    src = event_stream(spark, f"{run_dir}/data", files_per_trigger=2)
    name = f"sess{uuid.uuid4().hex[:12]}"
    q = (
        sessionize_stream(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        # checkpoint lives inside run_dir so the finally-rmtree reclaims it
        .option("checkpointLocation", f"{run_dir}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
        users = spark.read.parquet(f"{run_dir}/data").select("user_id").distinct()
        flush = users.select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            F.col("user_id").cast("long"),
            F.lit(FLUSH).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        flush.coalesce(1).write.mode("append").parquet(f"{run_dir}/data")
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        shutil.rmtree(run_dir, ignore_errors=True)
    return spark.table(name)


def streaming_sessionize_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the sessionizer in watermark-eviction mode — NO flush sentinel.
    Sessions emit as the event-time watermark passes their close; the
    still-open tail (close > final watermark) stays in state. Returns the
    emitted sessions (a proper, exactly-correct subset of the batch
    answer — asserted in tests/test_streaming.py)."""
    staged = stage_events(spark, sf_dir)
    run_dir = f"/tmp/spark_graft_streaming/run/{uuid.uuid4().hex[:12]}"
    os.makedirs(run_dir)
    src = event_stream(spark, staged, files_per_trigger=2)
    name = f"sesswm{uuid.uuid4().hex[:12]}"
    q = (
        sessionize_stream(src, mode="watermark")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{run_dir}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        shutil.rmtree(run_dir, ignore_errors=True)
    return spark.table(name)


def q_streaming_session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_sessionize(spark, sf_dir)


QUERIES = {"streaming_session_stateful": q_streaming_session_stateful}

# Same sessionization semantics as the batch session_window query → same
# DuckDB oracle (operators.windows.ORACLES['stream_session']).
from ..operators.windows import ORACLES as _BATCH_ORACLES  # noqa: E402

ORACLES = {"streaming_session_stateful": _BATCH_ORACLES["stream_session"]}
