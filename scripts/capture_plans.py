#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r17/<name>_<tag>.txt — the optimization round's before/after plan
evidence (guide §1: measure first; §7.2: read the plan).

Usage: python scripts/capture_plans.py <tag> <row> [<row> ...]

Multi-job pipelines (checkpointed CC, memoized signature tables) surface
only their CONSUMER plan in explain; the upstream jobs are documented via
the profile_rows job counts instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from duckdb_parquet_parser_spark.operators import collect_queries
    from duckdb_parquet_parser_spark.operators.dedup import clear_simhash_memos
    from duckdb_parquet_parser_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    queries, _ = collect_queries()
    for name in names:
        clear_simhash_memos()
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
