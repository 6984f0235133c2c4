#!/usr/bin/env python
"""Capture the FINAL adaptive plan (post-execution, AQE-resolved) for
named queries into plans/r18/<name>_final_adaptive.txt — VERDICT r17 #7:
the static explain of a checkpointed-label consumer shows SortMergeJoins
that AQE re-plans at runtime; only the executed plan shows what actually
ran. Usage: python scripts/capture_final_plans.py <row> [<row> ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("PLANS_ROUND", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)

    from duckdb_parquet_parser_spark.operators import collect_queries
    from duckdb_parquet_parser_spark.operators.dedup import clear_simhash_memos
    from duckdb_parquet_parser_spark.session import get_spark

    spark = get_spark(app_name="capture_final_plans")
    queries, _ = collect_queries()
    for name in names:
        clear_simhash_memos()
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        # execute the DataFrame's OWN QueryExecution (a noop write would
        # plan a fresh one): AdaptiveSparkPlan finalizes in place and
        # explain then shows isFinalPlan=true with the joins AQE
        # actually ran
        df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_final_adaptive.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
