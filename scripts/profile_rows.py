#!/usr/bin/env python
"""Per-row profiling harness for the optimization rounds: for each named
HEADLINE row, run the bench cold protocol (cache + memo clear, noop sink)
in a dedicated job group and report wall seconds + scheduled job count +
reps. Job counts × the machine's per-job scheduling floor (BASELINE.md)
separate plan-shape cost from data work — the guide's "measure first"
step (§1), made repeatable.

Usage: python scripts/profile_rows.py <row> [<row> ...] [--reps N]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckdb_parquet_parser_spark.operators import collect_queries
    from duckdb_parquet_parser_spark.operators.dedup import clear_simhash_memos
    from duckdb_parquet_parser_spark.session import get_spark

    spark = get_spark(app_name="profile_rows")
    queries, _ = collect_queries()
    # same unmeasured warmup as bench.py
    queries["rel_agg_q1"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in args:
        fn = queries[name]
        walls, jobs = [], []
        for i in range(reps):
            spark.catalog.clearCache()
            clear_simhash_memos()
            group = f"profile-{name}-{i}"
            sc.setJobGroup(group, name, False)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None, False)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        out[name] = {"walls": walls, "jobs": jobs}
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
