#!/usr/bin/env python
"""Strong-scaling sweep: run the data-bound headline queries at a fixed
scale factor while varying executor-thread count (local[N]), one fresh
JVM per N. The point is scale evidence, not absolute time: a plan whose
runtime keeps dropping as cores double is shuffle/partition-parallel and
survives a cluster; a flat line means a serial stage (driver loop, single
task, unsplittable source) is hiding somewhere.

Usage: python scripts/scaling_bench.py [cores ...]   (default 4 8 16 32)
Prints one JSON line: {"sf": .., "runs": {"4": {q: sec}, ...}}
Each N runs in a subprocess so the JVM/core binding is honest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Data-bound subset of bench.py's HEADLINE: queries whose sf0.1 time is
# dominated by real work, not the fixed job floor (BENCH_NOTES round 4).
QUERIES = [
    "ns_dedup_minhash",
    "ns_dedup_simhash_pairs",
    "ns_dedup_components",
    "ns_contamination",
    "ns_embed_neardup",
    "ns_kmeans_embed",
    "ns_text_tokens",
    "x1_chunk_index",
    "rel_join_q5",
    # round-5 additions: the two data-bound n-gram statistics rows
    "ns_dupgram_profile",
    "ns_shared_ngrams",
    # round-11: the media cluster pipelines — the Python decode stage is
    # the data-parallel leg (mapInPandas over row splits); the CC tail
    # is job-floor-bound, so expect partial, not linear, scaling
    "ns_mm_image_dedup_cluster",
    "ns_mm_video_dedup_cluster",
    # round-12: convergent-CC embed clusters — the pair stage
    # (applyInPandas per IVF cell) is the data-parallel leg; the blocked
    # CC rounds are exchange-parallel with a per-block probe job, so
    # expect partial scaling with a floor like the media clusters
    "ns_embed_dedup_cluster",
]

_CHILD = r"""
import json, sys, time
from duckdb_parquet_parser_spark.operators import collect_queries
from duckdb_parquet_parser_spark.session import get_spark

sf_dir, names = sys.argv[1], sys.argv[2].split(",")
spark = get_spark(app_name="scaling-bench")
queries, _ = collect_queries()
# same unmeasured warmup/maintenance as bench.py
queries["rel_agg_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
from duckdb_parquet_parser_spark.sources.layout import (
    MANIFEST_PATTERN, clustered_documents, regex_manifest,
)
out = clustered_documents(spark, sf_dir)
regex_manifest(spark, out, "text", MANIFEST_PATTERN)
times = {}
for name in names:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    times[name] = round(time.perf_counter() - t0, 3)
print("SCALING_RESULT " + json.dumps(times))
"""


def run_at(cores: int) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, SF_DIR, ",".join(QUERIES)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line.removeprefix("SCALING_RESULT "))
    raise RuntimeError(f"cores={cores} failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    cores = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    runs = {str(n): run_at(n) for n in cores}
    print(json.dumps({"sf_dir": SF_DIR, "runs": runs}))


if __name__ == "__main__":
    main()
