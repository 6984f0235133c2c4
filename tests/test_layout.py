"""Physical layout at scale: partition pruning reaches the scan, bucketed
joins skip their Exchange."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.catalog import load_table
from duckdb_parquet_parser_spark.plans import formatted_plan
from duckdb_parquet_parser_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes_partitions(spark, sf_smoke):
    path = os.path.join(tempfile.gettempdir(), "sg_part_events")
    ev = load_table(spark, sf_smoke, "events")
    write_partitioned(ev, path, ["event_type"])
    q = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "event_type" in plan
    # pruned read returns exactly the partition's rows
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert q.count() == want
    # directory layout really is hive-partitioned
    assert any(d.startswith("event_type=") for d in os.listdir(path))


def test_bucketed_join_skips_exchange(spark, sf_smoke):
    """groupBy + self-join on the bucket key: ZERO exchanges — the write-
    time bucketing satisfies every distribution requirement in the plan.
    (Auto-broadcast is disabled for the assertion: at fixture scale Spark
    would broadcast the small side, hiding what bucketing buys at 100 TB
    where neither side broadcasts.)"""
    orders = load_table(spark, sf_smoke, "orders")
    write_bucketed(orders, "orders_bkt", "o_custkey", n_buckets=8)
    bkt = spark.table("orders_bkt")
    agg = bkt.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    joined = bkt.join(agg, "o_custkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("Exchange") == 0, plan
    # values intact
    assert joined.count() == orders.count()
