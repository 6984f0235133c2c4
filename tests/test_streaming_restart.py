"""Checkpoint-restart exactly-once (round 16): the streaming axis every
prior test skipped. The suite's streaming tests run each query start→
finish in ONE query lifetime; production streams restart constantly
(deploys, reschedules, crashes) and the whole Structured Streaming
contract is that a restart from the checkpoint is INVISIBLE in the
output: state reloads, the in-flight batch replays, the sink commits
each epoch once. This module certifies that contract on our own
pipelines against our own batch oracles.

Design: deterministic two-phase source instead of stop-mid-stream
timing races — phase 1 exposes the first half of the staged files and
runs ``availableNow`` to completion (same ``maxFilesPerTrigger=1``
microbatching as the live queries); the query object is then discarded
(a cold JVM-state restart as far as the stream is concerned — only the
checkpoint persists), phase 2 adds the remaining files and restarts
with the SAME checkpoint + sink; a third restart with NO new data pins
idempotence (zero rows appended). The final parquet sink must equal
both the batch oracle and an UNINTERRUPTED single-lifetime run.

Two state shapes:
- ``dropDuplicates``: phase-2 re-occurrences of phase-1 keys must stay
  suppressed — provably exercised (the overlap is asserted non-empty),
  so a state-store that failed to reload would emit visible duplicates;
- watermarked tumbling append: windows left OPEN at the phase-1
  shutdown (watermark had not passed their end) must re-open, absorb
  phase-2 rows, and emit exactly once.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.streaming.source import stage_events


def _staged_parts(spark, sf_dir):
    staged = stage_events(spark, sf_dir)
    parts = sorted(
        f for f in os.listdir(staged) if f.startswith("part-")
    )
    assert len(parts) >= 4, "restart test needs several staged files"
    return staged, parts


def _copy_parts(staged, parts, dst):
    os.makedirs(dst, exist_ok=True)
    for f in parts:
        # copy2 keeps the re-stamped mtimes, so arrival order (and with
        # it watermark progression) matches the canonical staged dir
        shutil.copy2(os.path.join(staged, f), os.path.join(dst, f))


def _run_available_now(spark, src_dir, schema, transform, out, ckpt):
    """One query LIFETIME: availableNow over whatever src_dir currently
    holds, single-file microbatches, parquet sink, then stop. Returns
    rows appended during this lifetime (from the sink's own growth)."""
    before = (
        spark.read.parquet(out).count() if os.path.exists(out) else 0
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).count() - before


def _phased_run(spark, sf_dir, tmp_path, tag, transform):
    """The interrupted run (phase1 → restart → phase2 → idempotent
    restart) AND the uninterrupted single-lifetime control, same
    transform, separate sinks. Returns (final_df, control_df,
    phase_appends)."""
    staged, parts = _staged_parts(spark, sf_dir)
    half = len(parts) // 2
    src = str(tmp_path / f"{tag}_src")
    out = str(tmp_path / f"{tag}_out")
    ckpt = str(tmp_path / f"{tag}_ckpt")
    schema = spark.read.parquet(staged).schema

    _copy_parts(staged, parts[:half], src)
    a1 = _run_available_now(spark, src, schema, transform, out, ckpt)
    _copy_parts(staged, parts[half:], src)
    a2 = _run_available_now(spark, src, schema, transform, out, ckpt)
    a3 = _run_available_now(spark, src, schema, transform, out, ckpt)

    out_c = str(tmp_path / f"{tag}_out_control")
    ckpt_c = str(tmp_path / f"{tag}_ckpt_control")
    _run_available_now(spark, src, schema, transform, out_c, ckpt_c)
    return (
        spark.read.parquet(out),
        spark.read.parquet(out_c),
        (a1, a2, a3),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dedup_state_survives_restart(spark, sf_smoke, tmp_path):
    def transform(stream):
        return stream.dropDuplicates(["user_id", "event_type"]).select(
            "user_id", "event_type"
        )

    final, control, (a1, a2, a3) = _phased_run(
        spark, sf_smoke, tmp_path, "dedup", transform
    )

    # the restart actually had state to lose: with a fixed user
    # population time-sliced into files, phase 2's rows re-see keys
    # already emitted before the restart (at sf0.01 the key space
    # saturates IN phase 1, so every phase-2 row is a re-seen key — the
    # strongest possible probe: lost state would re-emit visibly).
    # Prove the overlap from the data rather than assuming it:
    events = spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))
    staged, parts = _staged_parts(spark, sf_smoke)
    half = len(parts) // 2
    keys_p1 = spark.read.parquet(
        *[os.path.join(staged, f) for f in parts[:half]]
    ).select("user_id", "event_type")
    keys_p2 = spark.read.parquet(
        *[os.path.join(staged, f) for f in parts[half:]]
    ).select("user_id", "event_type")
    overlap = keys_p2.intersect(keys_p1).count()
    assert overlap > 0  # phase 2 re-saw pre-restart keys
    batch = events.select("user_id", "event_type").distinct()
    n_distinct = batch.count()
    assert a1 > 0
    assert a2 == n_distinct - a1  # phase 2 emitted ONLY unseen keys
    assert a3 == 0  # restart with no new data appends nothing

    # exactly-once, restart-invisible, equal to the batch oracle
    assert final.count() == n_distinct  # no duplicate emissions at all
    assert _rows(final) == _rows(batch)
    assert _rows(final) == _rows(control)


def test_windowed_agg_survives_restart(spark, sf_smoke, tmp_path):
    """Watermarked tumbling count in append mode: open-window state
    reloads across the restart and every closed window emits once."""

    def transform(stream):
        ts = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        return (
            ts.withWatermark("ts", "6 hours")
            .groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("window_start"), "event_type", "n"
            )
        )

    final, control, (a1, a2, a3) = _phased_run(
        spark, sf_smoke, tmp_path, "win", transform
    )
    assert a1 > 0 and a2 > 0  # both lifetimes closed some windows
    assert a3 == 0
    rows_final = _rows(final)
    assert rows_final == _rows(control)

    # every emitted (window, type) appears exactly once — the replayed
    # in-flight batch did not double-emit
    assert len(rows_final) == final.select(
        "window_start", "event_type"
    ).distinct().count()

    # and the emitted windows carry the BATCH-exact counts (a window
    # split across the restart must have merged its two halves)
    batch = (
        spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    batch_map = {
        (r[0], r[1]): r[2] for r in batch.collect()
    }
    for w_start, etype, n in rows_final:
        assert batch_map[(w_start, etype)] == n, (w_start, etype)
    # append mode emits the watermark-closed subset; it must not be empty
    # and must not exceed the batch window count
    assert 0 < len(rows_final) <= len(batch_map)
