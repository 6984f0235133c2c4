#!/usr/bin/env python
"""n_blocks sweep for the salted LSH candidate join at the sf1 decade.

Why this study exists (REVIEW_r16 #2): since round 16 both registered
minhash rows run `lsh_candidate_pairs_salted` at the module default
``N_SALT_BLOCKS = 8``, so the registered surface carries one plan under
two names. The r17 options on record are (a) differentiate the salted
row by an explicit ``n_blocks`` operating point or (b) retire it with a
ledger note. Neither choice should be made on intuition: the knob's
actual wall-vs-blocks curve at the scale where salting matters (the sf1
decade is where the UNSALTED join measurably demoted — BENCH_NOTES r15
CORRECTION) is one 10-minute measurement, so measure it.

What it measures: candidate-pair generation ONLY (the stage salting
changes), on the replica-disjoint sf1 documents decade built by
``sf1_spotcheck.py``. Signatures are computed once and persisted so
every leg times the same input; each leg runs
``lsh_candidate_pairs_salted(sigs, n_blocks).write(noop)`` cold
(``spark.catalog.clearCache()`` never touches the explicit persist) and
a second warm run. ``n_blocks=1`` degenerates to the unsalted
single-task-per-bucket placement (modulo the constant explode/sequence
scaffolding) and serves as the in-protocol baseline. A ``pairs`` count
per leg pins the output-invariance claim (salting repartitions work,
never changes it) across the whole sweep.

Reading the result: the curve's knee is where the hot-bucket ceiling
stops binding; past it, extra blocks only add left-side replication
(the left leg replicates each row to ``n_blocks - block`` targets, so
input volume grows ~linearly in n_blocks while the per-task ceiling
shrinks ~quadratically in it). The r17 decision rule derived from this
record lives in BENCH_NOTES next to the numbers.

Usage: python scripts/salt_blocks_study.py [--blocks 1 4 8 16 32]
       (requires .scratch/sf1/documents.parquet — run sf1_spotcheck
       once first; refuses rather than silently building its own
       fixture so every study row is against the SAME decade table)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = (
    f"{REPO}:{os.environ['PYTHONPATH']}"
    if os.environ.get("PYTHONPATH")
    else str(REPO)
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--blocks", type=int, nargs="+", default=[1, 4, 8, 16, 32]
    )
    ap.add_argument("--sf-dir", default=str(REPO / ".scratch" / "sf1"))
    args = ap.parse_args()
    os.chdir(REPO)

    if not os.path.exists(os.path.join(args.sf_dir, "documents.parquet")):
        print(
            f"missing {args.sf_dir}/documents.parquet — run "
            "scripts/sf1_spotcheck.py first",
            file=sys.stderr,
        )
        return 2

    from pyspark.storagelevel import StorageLevel

    from duckdb_parquet_parser_spark.operators.dedup import (
        _doc_word_arrays,
        lsh_candidate_pairs_salted,
        minhash_signatures_from_arrays,
    )
    from duckdb_parquet_parser_spark.session import get_spark

    spark = get_spark(app_name="salt-blocks-study")
    sigs = minhash_signatures_from_arrays(
        _doc_word_arrays(spark, args.sf_dir)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = sigs.count()  # materialize before any timed leg

    record: dict = {
        "study": "salt_blocks_sf1",
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "legs": {},
    }
    pair_counts = set()
    for nb in args.blocks:
        leg = {}
        for phase in ("cold", "warm"):
            spark.catalog.clearCache()  # shuffle files, not the persist
            t0 = time.perf_counter()
            lsh_candidate_pairs_salted(sigs, nb).write.format(
                "noop"
            ).mode("overwrite").save()
            leg[phase] = round(time.perf_counter() - t0, 2)
        leg["pairs"] = lsh_candidate_pairs_salted(sigs, nb).count()
        pair_counts.add(leg["pairs"])
        record["legs"][str(nb)] = leg
    record["pairs_invariant"] = len(pair_counts) == 1
    sigs.unpersist()
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
