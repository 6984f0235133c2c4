"""Time-window aggregations over events — tumbling / sliding / session.

These run here in BATCH mode (same ``F.window`` / ``F.session_window``
expressions Structured Streaming uses), so the DuckDB oracle can check the
exact window semantics; `streaming/` wires the *same* aggregations into
readStream/writeStream with watermarks, verified in tests against these
batch results (streaming-batch equivalence is the Structured Streaming
contract).

Oracle portability: Spark windows are epoch-aligned, so window starts are
reproduced in SQL as ``to_timestamp(floor(epoch(ts)/width)*width)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dsum

SESSION_GAP = "30 minutes"
SESSION_GAP_SECONDS = 1800


def tumbling_agg(events: DataFrame, width: str = "1 day") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 day", slide: str = "12 hours"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_agg(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Gap-based sessionization via Spark's native session_window: a session
    ends when no event arrives for `gap`; end = last event + gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def enrich_agg(events: DataFrame, cust: DataFrame) -> DataFrame:
    """Stream-static enrichment plan, shared by the streaming query
    (streaming/windows.q_streaming_enrich) and its batch twin
    (scripts/streaming_batch_floor.py): broadcast-join the customer
    dimension, aggregate per (segment, event_type). One definition so the
    published streaming-vs-batch denominator can never drift from the
    streaming plan (code-review r6). ``cust`` must already be projected
    to (user_id, segment)."""
    return (
        events.join(F.broadcast(cust), "user_id")
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


def view_purchase_projections(
    events: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(views, buys) projections for the attribution join — shared by
    streaming (which adds watermarks on top) and batch."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("buy_ts"),
    )
    return views, buys


ATTRIBUTION_WINDOW = "30 MINUTES"


def attribution_join(views: DataFrame, buys: DataFrame) -> DataFrame:
    """Views matched to purchases by the same user within the attribution
    window — the event-time-bounded join both the stream-stream query and
    its batch twin execute (one definition, code-review r6)."""
    return views.join(
        buys,
        F.expr(
            "v_user = b_user AND buy_ts >= view_ts"
            f" AND buy_ts <= view_ts + INTERVAL {ATTRIBUTION_WINDOW}"
        ),
    ).select(F.col("v_user").alias("user_id"), "view_id", "purchase_id")


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load_table(spark, sf_dir, "events"))


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load_table(spark, sf_dir, "events"))


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load_table(spark, sf_dir, "events"))


QUERIES = {
    "stream_tumbling": q_stream_tumbling,
    "stream_sliding": q_stream_sliding,
    "stream_session": q_stream_session,
}

ORACLES = {
    "stream_tumbling": """
        SELECT to_timestamp(floor(epoch(ts) / 86400) * 86400)::TIMESTAMP
                   AS window_start,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # 24h window sliding by 12h: every event belongs to exactly 2 windows —
    # starts floor_12h(ts) and floor_12h(ts) - 12h.
    "stream_sliding": """
        WITH starts AS (
            SELECT unnest([
                to_timestamp(floor(epoch(ts) / 43200) * 43200)::TIMESTAMP,
                to_timestamp(floor(epoch(ts) / 43200) * 43200 - 43200)::TIMESTAMP
            ]) AS window_start
            FROM events
        )
        SELECT window_start, count(*) AS n FROM starts GROUP BY 1
    """,
    # Session = maximal event chain with inter-event gap ≤ 30 min (an event
    # at EXACTLY last+gap still merges — probed Spark session_window
    # semantics, pinned by tests/test_randomized_events.py's exact-tie
    # lattice); session_end = last event + gap.
    "stream_session": f"""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts))
                        > {SESSION_GAP_SECONDS}
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                   THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL {SESSION_GAP_SECONDS} SECOND AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
}
