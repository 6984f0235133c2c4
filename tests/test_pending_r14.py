"""Pending token-mix queries (operators/pending_r14.py), staged for the
round-15 window: the full query-vs-oracle differential runs HERE every
round even though the queries aren't registered in the driver contract
yet. Round 14 registered the tranche's four TPC-H completers
(operators/relational_q9.py — their locks moved to
tests/test_relational_q9.py); the two token-mix queries floated one
round because the r14 window was exactly full (the staging discipline
that shipped pending_r13 → curation.py cleanly)."""

from __future__ import annotations

import pytest

from duckdb_parquet_parser_spark.operators.pending_r14 import (
    ORACLES_PENDING,
    QUERIES_PENDING,
    SOURCE_TOKEN_BUDGET,
    q_ns_token_budget_mix,
)
from duckdb_parquet_parser_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES_PENDING))
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_pending_query_matches_oracle(spark, name, sf_dir):
    res = compare_query(
        spark, sf_dir, name, QUERIES_PENDING[name], ORACLES_PENDING[name]
    )
    assert res.ok, res


def test_token_budget_watermark_semantics(spark, sf_smoke):
    """Structural invariants the hash alone doesn't explain: within each
    source, kept docs form a PREFIX of the quality order; the budget is
    a watermark (the straddling doc is kept: every kept doc starts below
    the budget, every dropped doc starts at-or-past it); cumulative sums
    are consistent with the per-doc token counts."""
    rows = q_ns_token_budget_mix(spark, sf_smoke).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r["logit_micro"], r["doc_id"]))
        cum = 0
        seen_drop = False
        for r in rs:
            assert r["cum_tokens"] == cum + r["n_tokens"], (src, r)
            starts_below = cum < SOURCE_TOKEN_BUDGET
            assert r["kept"] == starts_below, (src, r)
            if not starts_below:
                seen_drop = True
            else:
                # prefix property: no kept doc after the first drop
                assert not seen_drop, (src, r)
            cum = r["cum_tokens"]


def test_skew_safe_token_keepers_equivalent(spark, sf_smoke):
    """The salted two-phase token fill must return EXACTLY the
    full-window variant's keepers with identical cumulative sums — the
    docstring's pruning argument (past-the-watermark inside your own
    bucket ⇒ past it globally), checked end-to-end, including on a
    deliberately skewed one-megasource frame."""
    import pyspark.sql.functions as F

    from duckdb_parquet_parser_spark.operators.pending_r14 import (
        SOURCE_TOKEN_BUDGET,
        per_source_token_keepers,
    )

    full = q_ns_token_budget_mix(spark, sf_smoke)
    want = {
        (r["doc_id"], r["source"], r["cum_tokens"])
        for r in full.filter("kept").collect()
    }
    base = full.select("doc_id", "source", "n_tokens", "logit_micro")
    got = {
        (r["doc_id"], r["source"], r["cum_tokens"])
        for r in per_source_token_keepers(
            base, SOURCE_TOKEN_BUDGET
        ).collect()
    }
    assert got == want
    # skewed: one megasource; reference computed driver-side
    skewed = base.withColumn(
        "source", F.when(F.col("doc_id") % 5 != 0, "mega").otherwise("rest")
    )
    got_mega = {
        (r["doc_id"], r["cum_tokens"])
        for r in per_source_token_keepers(skewed, 900).collect()
        if r["source"] == "mega"
    }
    rows = sorted(
        (
            (r["logit_micro"], r["doc_id"], r["n_tokens"])
            for r in skewed.filter("source = 'mega'").collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    cum, expect = 0, set()
    for _, doc, nt in rows:
        if cum < 900:
            expect.add((doc, cum + nt))
        cum += nt
    assert got_mega == expect


@pytest.mark.parametrize("seed", [55, 5151])
def test_pending_token_mixes_on_random_docs(spark, tmp_path, seed):
    """The staged token fills under the docs family's randomized
    pressure: null texts (excluded from scoring on both sides), heavy
    logit ties (duplicate docs), random (lang, source) domain shapes for
    the weighted mix's broadcast-scalar domain count."""
    import test_randomized_docs as docs

    sf_dir = docs._make_fixture(tmp_path, seed)
    for name in ("ns_token_budget_mix", "ns_weighted_token_mix"):
        res = compare_query(
            spark, sf_dir, name, QUERIES_PENDING[name], ORACLES_PENDING[name]
        )
        assert res.ok, res
