#!/usr/bin/env python
"""Watch-row band probe (VERDICT r9 #7 / r10 #4): interleaved cold reps
with same-window DuckDB denominators, per-row AQE job counts, and the
flat-wall weak-scaling comparison across sf0.01 → sf0.1 — the evidence
shape the floor-category waiver requires. Run on a quiet machine after
the main bench; paste the table into BENCH_NOTES.md.

    python scripts/watch_rows.py --rows ns_tfidf_topterms \
        rel_multi_exists_q21 ns_shared_ngrams --reps 3

CAVEAT (code review r11): this probe warms the session but does NOT run
bench.py's unmeasured one-time maintenance (clustered layout, staged
streaming source, dedup signature artifact). Rows that depend on those
(f1_clustered_prune, f1_regex_manifest, streaming_*,
ns_dedup_incremental*) must be probed AFTER a bench.py run on the same
machine, or rep-0 silently includes maintenance work the bench
methodology excludes and the bands don't compare.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark_rep(spark, fn, sf_dir):
    from duckdb_parquet_parser_spark.operators.dedup import clear_simhash_memos

    spark.catalog.clearCache()
    clear_simhash_memos()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _duck_rep(name, oracles, sf_dir):
    from duckdb_parquet_parser_spark.testing import (
        duckdb_connection,
        retarget_oracle_sql,
    )

    con = duckdb_connection(sf_dir)
    try:
        t0 = time.perf_counter()
        con.execute(retarget_oracle_sql(oracles[name], sf_dir)).fetchall()
        return round(time.perf_counter() - t0, 3)
    finally:
        con.close()


def _job_count(spark, fn, sf_dir, name):
    from duckdb_parquet_parser_spark.operators.dedup import clear_simhash_memos

    spark.catalog.clearCache()
    clear_simhash_memos()
    sc = spark.sparkContext
    group = f"watch-{name}"
    sc.setJobGroup(group, "watch-row job count", False)
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup(None, None, False)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def _floor_probe(spark, jobs: int = 5) -> float:
    """Per-job scheduling-floor estimate in this window: tiny no-data
    jobs, wall / count."""
    t0 = time.perf_counter()
    for _ in range(jobs):
        spark.range(2).repartition(2).write.format("noop").mode(
            "overwrite"
        ).save()
    return round((time.perf_counter() - t0) / jobs, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="+", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--small-sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from duckdb_parquet_parser_spark.operators import collect_queries
    from duckdb_parquet_parser_spark.session import get_spark

    queries, oracles = collect_queries()
    spark = get_spark(app_name="watch-rows")
    # warm the session once per SF, unmeasured (the weak-scaling block
    # reads the small SF too — an unwarmed footer cache would charge
    # rep 0 a first-read tax the bench methodology excludes)
    for warm_sf in (args.sf, args.small_sf):
        queries["rel_agg_q1"](spark, warm_sf).write.format("noop").mode(
            "overwrite"
        ).save()

    print(f"floor probe: {_floor_probe(spark)} s/job")
    header = ["rep"]
    for n in args.rows:
        header += [f"{n} spark", f"{n} duck"]
    table = []
    for rep in range(args.reps):
        row = [str(rep)]
        for n in args.rows:  # interleave: every row visited per rep
            s = _spark_rep(spark, queries[n], args.sf)
            d = _duck_rep(n, oracles, args.sf)
            row += [f"{s}", f"{d}"]
        table.append(row)
    print(" | ".join(header))
    for row in table:
        print(" | ".join(row))

    # Denominator-spread summary (VERDICT r11 perf watch item): the
    # components cold ratio swung 1.03→1.94 across same-day runs because
    # the DUCKDB side moved, not the plan — surface min/median/max of
    # the interleaved denominators and the ratio against the MEDIAN so a
    # one-sample denominator can never own the headline number.
    # --reps 0 (job-counts/weak-scaling only) leaves the table empty:
    # skip the summary instead of min()-ing an empty sequence (ADVICE r12)
    import statistics

    for i, n in enumerate(args.rows if table else []):
        sparks = [float(r[1 + 2 * i]) for r in table]
        ducks = [float(r[2 + 2 * i]) for r in table]
        med = statistics.median(ducks)
        # a sub-millisecond oracle rounds to 0.0 — report the ratio as
        # unboundable instead of dividing by zero
        ratio = round(min(sparks) / med, 2) if med > 0 else "inf(denom~0)"
        print(
            f"summary {n}: spark min/med {min(sparks)}/"
            f"{round(statistics.median(sparks), 3)} | duck min/med/max "
            f"{min(ducks)}/{round(med, 3)}/{max(ducks)} | "
            f"ratio_vs_median_denom {ratio}"
        )

    for n in args.rows:
        print(f"jobs {n}: {_job_count(spark, queries[n], args.sf, n)}")

    print("weak scaling (2 reps each):")
    for n in args.rows:
        small_s = [
            _spark_rep(spark, queries[n], args.small_sf) for _ in range(2)
        ]
        small_d = [_duck_rep(n, oracles, args.small_sf) for _ in range(2)]
        big_s = [_spark_rep(spark, queries[n], args.sf) for _ in range(2)]
        big_d = [_duck_rep(n, oracles, args.sf) for _ in range(2)]
        print(
            f"{n}: sf0.01 spark {small_s} duck {small_d} | "
            f"sf0.1 spark {big_s} duck {big_d}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
