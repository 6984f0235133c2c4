#!/usr/bin/env python
"""Task-retry determinism probe — the failure mode every other axis skips.

On a 1000-executor cluster, task attempts fail and retry as a matter of
course (preemption, spot reclamation, OOM-kill, disk faults), and Spark
re-runs the lost partition from its lineage. Every correctness claim in
this repo therefore silently assumes RETRY-SAFETY: a recomputed first
attempt must produce byte-identical rows, or downstream stages consume a
mix of attempt-0 and attempt-1 outputs that no single-run differential
can catch. The committed axes (DuckDB oracles, randomized fixtures,
conf perturbations) all run attempt-0-only in local mode, where task
failure is FATAL by default — so this probe runs in its own process
with a retry-enabled master (``local[8, 3]`` = 3 attempts/task) and
INJECTS a deterministic failure: a ``mapInPandas`` identity pass-through
that raises on every (stage, partition 0, attempt 0) via
``TaskContext``; the retried attempt 1 then succeeds.

Three pipeline shapes run over the flaky source, chosen for distinct
retry surfaces:

- ``minhash_pairs``: the salted LSH candidate join — a retried scan
  feeding a two-sided self-join (the same lineage re-executes on BOTH
  sides; nondeterministic signature compute would desynchronize them);
- ``agg``: a hash aggregation with map-side partials — a retried map
  task re-emits its partials (double-count on replay would show here);
- ``cc_labels``: convergent connected components over the pair graph —
  an ITERATIVE job where a retry in round k feeds rounds k+1..n
  (amplifies any replay divergence).

Each shape runs flaky and clean in the SAME session; the record pins
rows(flaky) == rows(clean) exactly, plus ``attempts_failed`` > 0 read
from the injection's per-stage marker files, proving the retries
actually happened rather than the injection silently not firing.

Run directly, or through tests/test_retry_determinism.py (subprocess —
the retry-enabled master cannot coexist with the suite's shared
``local[32]`` JVM, whose master is fixed at first-session creation).

Usage: python scripts/retry_determinism_probe.py [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = (
    f"{REPO}:{os.environ['PYTHONPATH']}"
    if os.environ.get("PYTHONPATH")
    else str(REPO)
)


def flaky_identity(df, marker_dir):
    """Identity mapInPandas that fails (stage, partition 0, attempt 0):
    every stage that scans this frame loses one task's first attempt and
    succeeds on the retry — the production blip, deterministically. The
    proof the injection FIRED is a marker file appended before the raise
    (an accumulator cannot serve here: Spark discards accumulator
    updates from failed attempts — exactly the semantics this probe
    exists to exercise)."""

    def gen(it):
        import os as _os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            with open(
                _os.path.join(marker_dir, f"fired-{ctx.stageId()}"), "a"
            ) as f:
                f.write("1\n")
            raise RuntimeError("injected attempt-0 failure (probe)")
        yield from it

    return df.mapInPandas(gen, df.schema)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    os.chdir(REPO)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8, 3]")
        .appName("retry-determinism-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    marker_dir = tempfile.mkdtemp(prefix="retry_probe_")

    from duckdb_parquet_parser_spark.operators.dedup import (
        connected_components_converged,
        lsh_candidate_pairs_salted,
        minhash_signatures_from_arrays,
    )

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.array_distinct(F.split("text", " ")).alias("ws"),
        )
        .repartition(8, "doc_id")  # >1 partition so partition 0 is a subset
    )

    def pipelines(src):
        pairs = lsh_candidate_pairs_salted(
            minhash_signatures_from_arrays(src)
        )
        cc_labels, _rounds = connected_components_converged(pairs)
        return {
            "minhash_pairs": pairs,
            "agg": src.groupBy("source").agg(
                F.count("*").alias("n"),
                F.sum(F.size("ws")).alias("words"),
            ),
            "cc_labels": cc_labels,
        }

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    record: dict = {"probe": "retry_determinism", "sf_dir": args.sf_dir}
    clean = {k: rows(v) for k, v in pipelines(docs).items()}
    flaky = {
        k: rows(v)
        for k, v in pipelines(flaky_identity(docs, marker_dir)).items()
    }
    record["attempts_failed"] = len(os.listdir(marker_dir))
    record["shapes"] = {
        k: {
            "rows": len(clean[k]),
            "identical": flaky[k] == clean[k],
        }
        for k in clean
    }
    record["ok"] = (
        record["attempts_failed"] > 0
        and all(s["identical"] for s in record["shapes"].values())
        and all(s["rows"] > 0 for s in record["shapes"].values())
    )
    print(json.dumps(record))
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
