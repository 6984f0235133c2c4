"""The central differential test: every declared query vs its DuckDB
oracle at sf0.001 (fast) — a local replica of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from duckdb_parquet_parser_spark.operators import collect_queries
from duckdb_parquet_parser_spark.testing import compare_query, duckdb_connection

QUERIES, ORACLES = collect_queries()

# Metadata-inspection oracles embed the sf0.01 file path (parquet_metadata()
# can't read from a view), so those pairs must run at sf0.01 locally too.
SF_PINNED = {"r1_rowgroup_meta", "r6_chunk_values", "r7_chunk_bytes", "r8_page_index"}


def test_every_query_has_oracle_or_is_flagged():
    missing = [n for n in QUERIES if n not in ORACLES]
    # rows-only ops are allowed but must be a deliberate, short list
    assert len(missing) <= 3, f"too many oracle-less queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, sf_smoke, sf_correct, name):
    sf = sf_correct if name in SF_PINNED else sf_smoke
    if name not in ORACLES:
        df = QUERIES[name](spark, sf)
        assert df.count() >= 0
        return
    res = compare_query(spark, sf, name, QUERIES[name], ORACLES[name])
    assert res.ok, str(res)
