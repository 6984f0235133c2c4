"""Session schema catalog (catalog.read_parquet_cached_schema, r17
optimization round): the memoized-schema read must be schema-identical
to Spark's own inference, must stop scheduling the per-read inference
job once warm, and must re-infer when the file content changes (the
stale-schema hazard the (mtime, size) key exists for)."""

from __future__ import annotations

import os
import time

from pyspark.sql import Row

from duckdb_parquet_parser_spark.catalog import (
    _SCHEMA_MEMO,
    load_table,
    read_parquet_cached_schema,
    table_path,
)


def test_cached_schema_matches_inference(spark, sf_smoke):
    """Warm-path schema == Spark's own inferred schema, column for
    column (the memo stores exactly what inference returned, so this is
    the identity the optimization rests on)."""
    path = table_path(sf_smoke, "lineitem")
    inferred = spark.read.parquet(path).schema
    _SCHEMA_MEMO.clear()
    first = read_parquet_cached_schema(spark, path)  # infers + memoizes
    warm = read_parquet_cached_schema(spark, path)  # memo hit
    assert first.schema == inferred
    assert warm.schema == inferred
    # same rows either way (order-insensitive)
    a = {tuple(r) for r in warm.limit(50).collect()}
    b = {tuple(r) for r in spark.read.parquet(path).limit(50).collect()}
    assert a == b


def test_warm_read_schedules_no_inference_job(spark, sf_smoke):
    """The point of the memo: a warm read plans without scheduling any
    job at all (schema inference was the only eager work in
    ``spark.read.parquet``), and the first ACTION on it runs exactly the
    scan jobs — measured as strictly fewer scheduled jobs than the
    cold path's action, which pays inference + scan."""
    path = table_path(sf_smoke, "documents")
    sc = spark.sparkContext

    def jobs_for(tag, make_df):
        group = f"schema-catalog-{tag}"
        sc.setJobGroup(group, tag, False)
        try:
            make_df().write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup(None, None, False)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    _SCHEMA_MEMO.clear()
    cold = jobs_for("cold", lambda: read_parquet_cached_schema(spark, path))
    warm = jobs_for("warm", lambda: read_parquet_cached_schema(spark, path))
    assert warm < cold, (cold, warm)


def test_rewritten_file_reinfers(spark, tmp_path):
    """Content change ⇒ key change ⇒ fresh inference: a rewrite that
    changes the schema must be visible on the very next read — the memo
    can never serve a stale schema for new bytes."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([Row(a=1)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    first = read_parquet_cached_schema(spark, p)
    assert first.columns == ["a"]
    # ensure a distinct mtime_ns even on coarse-grained filesystems
    time.sleep(0.05)
    spark.createDataFrame([Row(b="x", c=2)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    os.utime(p)
    second = read_parquet_cached_schema(spark, p)
    assert sorted(second.columns) == ["b", "c"]


def test_load_table_uses_catalog(spark, sf_smoke):
    """load_table rides the memo: two loads of the same table return
    identical schemas and the second plans from the memo (key present)."""
    _SCHEMA_MEMO.clear()
    a = load_table(spark, sf_smoke, "region")
    assert len(_SCHEMA_MEMO) == 1
    b = load_table(spark, sf_smoke, "region")
    assert len(_SCHEMA_MEMO) == 1
    assert a.schema == b.schema
