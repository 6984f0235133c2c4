"""Curation-operator gates (operators/curation.py — the round-12 staged
queries, registered in the round-13 contract): the query-vs-oracle
differential ran HERE every round while the queries were parked as
``pending_r13``; after registration it keeps running unchanged as the
local gate beside the driver's, plus the structural invariants the hash
alone doesn't explain."""

from __future__ import annotations

import pytest

from duckdb_parquet_parser_spark.operators.curation import (
    ORACLES,
    QUERIES,
    SOURCE_CAP,
    q_ns_source_cap,
)
from duckdb_parquet_parser_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_curation_query_matches_oracle(spark, name, sf_dir):
    res = compare_query(spark, sf_dir, name, QUERIES[name], ORACLES[name])
    assert res.ok, res


def test_source_cap_structure(spark, sf_smoke):
    """Structural invariants the hash alone doesn't explain: every
    source keeps AT MOST the cap; a source with fewer docs than the cap
    keeps them all; ranks are dense 1..n within each source."""
    rows = q_ns_source_cap(spark, sf_smoke).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rs in by_src.items():
        kept = [r for r in rs if r["kept"]]
        assert len(kept) == min(SOURCE_CAP, len(rs)), src
        assert sorted(r["src_rank"] for r in rs) == list(
            range(1, len(rs) + 1)
        ), src
        # the kept set is exactly the rank prefix
        assert {r["src_rank"] for r in kept} == set(
            range(1, len(kept) + 1)
        ), src


def test_skew_safe_keepers_equivalent_to_window_variant(spark, sf_smoke):
    """The salted two-phase cap must return EXACTLY the full-window
    variant's keepers with identical ranks — the docstring's pruning
    argument (a row beaten k times in its own salt bucket can't be a
    global keeper), checked end-to-end."""
    from duckdb_parquet_parser_spark.operators.curation import (
        per_source_keepers,
    )

    full = q_ns_source_cap(spark, sf_smoke)
    want = {
        (r["doc_id"], r["source"], r["src_rank"])
        for r in full.filter("kept").collect()
    }
    base = full.select("doc_id", "source", "logit_micro")
    got = {
        (r["doc_id"], r["source"], r["src_rank"])
        for r in per_source_keepers(base, SOURCE_CAP).collect()
    }
    assert got == want
    # and on a deliberately skewed frame: one megasource, salts do work
    import pyspark.sql.functions as F

    skewed = base.withColumn(
        "source", F.when(F.col("doc_id") % 5 != 0, "mega").otherwise("rest")
    )
    w = {
        (r["doc_id"], r["src_rank"])
        for r in per_source_keepers(skewed, 7).collect()
        if r["source"] == "mega"
    }
    # exact reference: sort driver-side
    rows = sorted(
        ((r["logit_micro"], r["doc_id"]) for r in skewed.filter(
            "source = 'mega'").collect()),
        key=lambda t: (-t[0], t[1]),
    )[:7]
    assert w == {(doc, i + 1) for i, (_, doc) in enumerate(rows)}
