#!/usr/bin/env python
"""Honest denominators for the streaming bench rows (VERDICT r5 #6).

The driver bench compares each streaming query against a *batch* DuckDB
oracle, so those rows (100×+ "over baseline") measure Structured
Streaming's microbatch/state-store machinery, not plan quality. This
script times, in ONE session at the bench SF:

- the declared streaming query (memory sink, run to completion), and
- the SAME computation as a plain Spark batch DataFrame over the same
  staged input files,

so BENCH_NOTES can report streaming-vs-spark-batch (the machinery cost)
separately from spark-batch-vs-DuckDB (the engine-vs-engine number).

Usage: python scripts/streaming_batch_floor.py [sf_dir] [trials]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from duckdb_parquet_parser_spark.catalog import load_table  # noqa: E402
from duckdb_parquet_parser_spark.operators.windows import (  # noqa: E402
    attribution_join,
    enrich_agg,
    tumbling_agg,
    view_purchase_projections,
)
from duckdb_parquet_parser_spark.session import get_spark  # noqa: E402
from duckdb_parquet_parser_spark.streaming.source import stage_events  # noqa: E402
from duckdb_parquet_parser_spark.streaming.windows import (  # noqa: E402
    q_streaming_enrich,
    q_streaming_join,
    q_streaming_tumbling_rt,
)

# The batch twins BUILD THE SAME PLAN as the streaming queries — the
# aggregation/join definitions live once in operators.windows and both
# paths call them (code-review r6: hand-copied twins guarded only by a
# row-count assert could silently diverge from an edited streaming plan).


def batch_tumbling(spark, sf_dir):
    staged = stage_events(spark, sf_dir)
    return tumbling_agg(spark.read.parquet(staged))


def batch_enrich(spark, sf_dir):
    staged = stage_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return enrich_agg(spark.read.parquet(staged), cust)


def batch_join(spark, sf_dir):
    staged = stage_events(spark, sf_dir)
    views, buys = view_purchase_projections(spark.read.parquet(staged))
    return attribution_join(views, buys)


PAIRS = [
    ("streaming_tumbling_rt", q_streaming_tumbling_rt, batch_tumbling),
    ("streaming_enrich", q_streaming_enrich, batch_enrich),
    ("streaming_join", q_streaming_join, batch_join),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    stage_events(spark, sf_dir)  # stage once, outside the timings
    print(f"| query | streaming s (min of {trials}) | spark batch s | rows |")
    print("|---|---|---|---|")
    for name, sfn, bfn in PAIRS:
        sfn(spark, sf_dir).count()  # warm both paths
        bfn(spark, sf_dir).count()
        s_times, b_times, rows = [], [], None
        for _ in range(trials):
            t = time.time()
            rows = sfn(spark, sf_dir).count()
            s_times.append(time.time() - t)
            t = time.time()
            brows = bfn(spark, sf_dir).count()
            b_times.append(time.time() - t)
            assert brows == rows, (name, rows, brows)
        print(
            f"| {name} | {min(s_times):.2f} | {min(b_times):.2f} | {rows} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
