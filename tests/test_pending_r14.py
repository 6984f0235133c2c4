"""Round-14 pending queries (operators/pending_r14.py): the full
query-vs-oracle differential runs HERE every round even though the
queries aren't registered in the driver contract yet — the round-13
window is exactly full and round 14 already owes the 46-query
r11-certified rotation block, so registration waits for free slots
(the staging discipline that shipped pending_r13 → curation.py
cleanly)."""

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


def test_q6_predicates_reach_the_scan(spark, sf_smoke):
    """Q6's whole value is the scan shape: the date window, discount
    band and quantity cap must all be in the parquet scan's
    PushedFilters, and the aggregate must have a map-side partial."""
    from duckdb_parquet_parser_spark.operators.pending_r14 import (
        q_rel_filter_agg_q6,
    )
    from duckdb_parquet_parser_spark.plans import formatted_plan

    plan = formatted_plan(q_rel_filter_agg_q6(spark, sf_smoke))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan
    assert "partial_sum" in plan
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree and "Window" not in tree


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


def test_q9_window_plan_shape(spark, sf_smoke):
    """Q9's scale contract: the derived supply cost is a window min
    (ONE composite-key exchange of the fact rows — not an
    aggregate-then-join-back, which costs a second exchange + a
    SortMergeJoin); the p_name filter reaches the part scan; at most
    two non-broadcast exchanges total (window + final group)."""
    from duckdb_parquet_parser_spark.operators.pending_r14 import (
        q_rel_profit_q9,
    )
    from duckdb_parquet_parser_spark.plans import formatted_plan

    plan = formatted_plan(q_rel_profit_q9(spark, sf_smoke))
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "Window" in tree
    assert "StringContains(p_name" in plan or "Contains(p_name" in plan
    nbe = [
        ln for ln in tree.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(nbe) <= 2, nbe


@pytest.mark.parametrize("seed", [44, 5150])
def test_pending_relational_on_random_fixtures(spark, tmp_path, seed):
    """The staged relational shapes under randomized NULL/dangling-key
    pressure (the registered queries' discipline, applied before
    registration): reuse the relational family's generator — NULL
    prices/discounts/quantities/dates, dangling order and part keys,
    month-windows that can be empty or all-zero."""
    import test_randomized_relational as rel

    sf_dir = rel._make_fixture(tmp_path, seed)
    for name in (
        "rel_filter_agg_q6",
        "rel_priority_mix_q12",
        "rel_promo_share_q14",
        "rel_profit_q9",
    ):
        res = compare_query(
            spark, sf_dir, name, QUERIES_PENDING[name], ORACLES_PENDING[name]
        )
        assert res.ok, res


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
