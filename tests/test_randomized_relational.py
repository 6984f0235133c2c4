"""Differential testing on RANDOMIZED relational fixtures — orders,
lineitem, and customer regenerated with NULL keys, NULL measures,
duplicate sort keys, and dangling foreign keys, then the relational
query/oracle pairs re-run through the standard harness. NULL-key join
semantics (anti/semi/outer), NULL-skipping aggregates, and tie-breaking
in windows/top-k are where a DataFrame plan and an ANSI-SQL oracle can
quietly disagree; the shipped fixtures have clean keys and can't see it."""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

from duckdb_parquet_parser_spark.catalog import TABLES
from duckdb_parquet_parser_spark.testing import run_all

SF_BASE = "/root/testdata/sf0.001"

REL_QUERIES = [
    "rel_agg_q1",
    "rel_join_q5",
    "rel_join_q3",
    "rel_join_semi",
    "rel_join_anti",
    "rel_outer_join",
    "rel_merge_upsert",
    "rel_window_rank",
    "rel_window_running",
    "rel_window_lag",
    "rel_sort_topk",
    "rel_union",
    "rel_intersect",
    "rel_except",
    "rel_rollup",
    "rel_cube",
    "rel_grouping_sets",
    "rel_pivot",
    "rel_distinct",
    "rel_percentiles",
    "rel_subquery",
    "rel_exists_q4",
    "rel_corr_scalar_q17",
    "rel_group_in_q18",
    # round-6: disjunctive pushdown; the generator plants NULL
    # l_quantity (predicate → NULL → dropped) and NULL l_extendedprice
    # (skipped by the sum) to stress the OR under three-valued logic
    "rel_disjunctive_q19",
    # round-8: Q21's double correlation under NULL suppkeys / NULL dates
    # (late = UNKNOWN) and dangling orderkeys — the window min/max
    # rewrite must match the literal EXISTS/NOT EXISTS three-valued
    # semantics on every generated table
    "rel_multi_exists_q21",
    # round-9: Q13's zero-bucket outer-join histogram under NULL custkeys
    # (never join → land in the 0 bucket both engines) and Q22's
    # broadcast-AVG threshold + anti join under NULL acctbals (NULL > 0
    # and NULL×n > Σ are both UNKNOWN → dropped identically)
    "rel_outer_hist_q13",
    "rel_anti_avg_q22",
    # round-11: Q20's nested semi + grouped window-majority threshold
    # under NULL l_quantity (skipped by both DECIMAL sums identically)
    # and NULL/dangling part and supplier keys (semi-joins drop them);
    # Q7/Q8 volume shapes under NULL prices/discounts (volume NULL →
    # skipped by both engines' sums) and dangling join keys
    "rel_nested_semi_q20",
    "rel_volume_q7",
    "rel_mktshare_q8",
    # round-12: Q2's correlated-min under NULL l_extendedprice (NULL
    # costs skipped by MIN identically; a (part,supp) group whose every
    # price is NULL yields a NULL cost that can never equal the per-part
    # min) and dangling supplier keys (inner join to the region subset
    # drops them); Q11's share-of-global threshold under NULL prices
    # (both DECIMAL sums skip) and NULL part keys (grouped as their own
    # key by BOTH engines' GROUP BY)
    "rel_min_supplycost_q2",
    "rel_value_share_q11",
    # round-13: Q15's ties-kept global max under NULL prices (a supplier
    # whose every volume is NULL has NULL revenue; NULL = max is UNKNOWN
    # → dropped by both engines) and Q10's deterministic top-20 (exact
    # DECIMAL ordering, custkey tiebreak) under random return flags
    "rel_top_supplier_q15",
    "rel_returned_top_q10",
    # Q16's distinct-supplier count under an anti-join exclusion: the
    # oracle deliberately uses NOT EXISTS (= left-anti semantics) so
    # NULL supplier keys survive identically in both engines; NULL
    # group keys collapse into their own group in both
    "rel_supplier_cnt_q16",
]

_STATUSES = ["F", "O", "P"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE"]
_BASE = dt.datetime(1995, 1, 1)


def _make_fixture(tmp_path, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = tmp_path / f"randr{seed}"
    sf_dir.mkdir()
    for t in TABLES:
        src = os.path.join(SF_BASE, f"{t}.parquet")
        if t not in ("orders", "lineitem", "customer") and os.path.exists(src):
            os.symlink(src, sf_dir / f"{t}.parquet")

    n_cust, n_ord, n_li = 60, 250, 700
    nationkeys = list(range(25))
    customer = pa.table(
        {
            "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
            "c_name": pa.array([f"Customer#{i}" for i in range(1, n_cust + 1)]),
            "c_nationkey": pa.array(
                [rng.choice(nationkeys) for _ in range(n_cust)], pa.int64()
            ),
            # duplicate balances → percentile/window tie pressure
            "c_acctbal": pa.array(
                [rng.choice([0.0, 100.5, 100.5, -42.42, 9999.99, None])
                 for _ in range(n_cust)],
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                [rng.choice(_SEGMENTS) for _ in range(n_cust)]
            ),
        }
    )
    okeys = list(range(1, n_ord + 1))
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            # NULL custkeys + dangling custkeys (beyond n_cust)
            "o_custkey": pa.array(
                [
                    None
                    if rng.random() < 0.05
                    else rng.randrange(1, n_cust + 10)
                    for _ in okeys
                ],
                pa.int64(),
            ),
            "o_orderstatus": pa.array([rng.choice(_STATUSES) for _ in okeys]),
            # heavy ties in totalprice → rank/top-k tiebreak pressure
            "o_totalprice": pa.array(
                [rng.choice([100.0, 100.0, 250.25, 999.99, 5000.0])
                 for _ in okeys],
                pa.float64(),
            ),
            "o_orderdate": pa.array(
                [
                    _BASE + dt.timedelta(days=rng.randrange(0, 900))
                    for _ in okeys
                ],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array([rng.choice(_PRIOS) for _ in okeys]),
        }
    )
    lineitem = pa.table(
        {
            # dangling orderkeys (orders that don't exist) included
            "l_orderkey": pa.array(
                [rng.randrange(1, n_ord + 20) for _ in range(n_li)], pa.int64()
            ),
            "l_partkey": pa.array(
                [rng.randrange(1, 60) for _ in range(n_li)], pa.int64()
            ),
            "l_suppkey": pa.array(
                [rng.randrange(1, 10) for _ in range(n_li)], pa.int64()
            ),
            "l_linenumber": pa.array(
                [rng.randrange(1, 8) for _ in range(n_li)], pa.int64()
            ),
            # NULL quantities: the disjunctive q19 predicate must treat a
            # NULL range test as NULL (row dropped) identically in both
            # engines, and sum/avg aggregates must skip them
            "l_quantity": pa.array(
                [
                    None
                    if rng.random() < 0.04
                    else rng.choice([1.0, 5.0, 25.0, 50.0, 50.0])
                    for _ in range(n_li)
                ],
                pa.float64(),
            ),
            # NULL measures: sum(price*(1-disc)) must skip them identically
            "l_extendedprice": pa.array(
                [
                    None
                    if rng.random() < 0.03
                    else round(rng.uniform(10, 9000), 2)
                    for _ in range(n_li)
                ],
                pa.float64(),
            ),
            "l_discount": pa.array(
                [rng.choice([0.0, 0.05, 0.1]) for _ in range(n_li)], pa.float64()
            ),
            "l_tax": pa.array(
                [rng.choice([0.0, 0.08]) for _ in range(n_li)], pa.float64()
            ),
            "l_returnflag": pa.array(
                [rng.choice(["A", "N", "R"]) for _ in range(n_li)]
            ),
            "l_linestatus": pa.array(
                [rng.choice(["F", "O"]) for _ in range(n_li)]
            ),
            "l_shipdate": pa.array(
                [
                    _BASE + dt.timedelta(days=rng.randrange(0, 1000))
                    for _ in range(n_li)
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(customer, sf_dir / "customer.parquet")
    pq.write_table(orders, sf_dir / "orders.parquet")
    pq.write_table(lineitem, sf_dir / "lineitem.parquet")
    return str(sf_dir)


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_relational_queries_match_oracles_on_random_fixtures(
    spark, tmp_path, seed
):
    sf_dir = _make_fixture(tmp_path, seed)
    results = run_all(spark, sf_dir, only=REL_QUERIES)
    bad = [str(r) for r in results if not r.ok]
    assert not bad, "\n".join(bad)
    assert len(results) == len(REL_QUERIES)
