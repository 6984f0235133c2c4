"""TPC-H Q20-shaped nested semi-join + correlated grouped threshold —
the one common correlated-subquery pattern not yet in the §2.4 family
(VERDICT r10 #8; complements Q4/Q17/Q18/Q21/Q22 in relational_sub.py).

Q20's shape is a THREE-deep nesting: suppliers IN (supply relationships
OF parts IN (name-filtered parts) WHERE a correlated per-relationship
aggregate clears a scalar threshold). The fixture set has no partsupp
table, so the supply relationship is derived from lineitem itself —
``(l_suppkey, l_partkey)`` groups — and the availqty-vs-half-the-window
comparison becomes its lineitem-native mirror: a supplier qualifies when
for some name-matched part MORE THAN HALF of its all-time shipped
quantity of that part moved inside the one-year window
(``2·win_qty > total_qty``, the Q17 cross-multiplication trick: DECIMAL,
no division, exact and order-independent in both engines).

This lives in its own module: relational_sub.py's seven queries are
r9-driver-certified with unchanged plans, and the changed-module
re-certification rule (operators/__init__.py) must not burn seven of the
round-11 window's nine free slots on an addition that shares nothing but
a table loader.

Scale notes (100 TB):
- the part-name filter lands on a dimension scan and BROADCASTS into the
  lineitem semi-join — the fact table is filtered before its only
  shuffle (the (suppkey, partkey) hash aggregate with map-side partials);
- the qualified-supplier set is DISTINCT suppkeys — at most |supplier|
  rows — and broadcasts into the outer left-semi, so the supplier table
  never shuffles;
- the whole plan has exactly ONE fact-table exchange; Catalyst
  decorrelates nothing because the query is written as the joins the
  decorrelation would produce (the relational_sub.py discipline).

Reference analog: none (the reference has no relational operators);
TPC-H Q20 semantics re-derived from the public spec against the
driver's fixture schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import DEC

Q20_PART_PREFIX = "small gear"
Q20_LO, Q20_HI = "1996-01-01", "1997-01-01"
Q20_NATION_PREFIX = "NATION_1"  # NATION_1, NATION_10..NATION_19


def q_rel_nested_semi_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers (in the nation band) that shipped the majority of their
    all-time volume of some ``Q20_PART_PREFIX`` part inside the window —
    TPC-H Q20's nested-IN + correlated-threshold shape over the fixture
    schema. The grouped HAVING is a pre-aggregation; both IN lists ride
    broadcast semi-joins."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_PART_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_win = (
        F.col("l_shipdate") >= F.lit(Q20_LO).cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(Q20_HI).cast("timestamp"))
    grouped = (
        li.join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"),
            F.sum(
                F.when(in_win, F.col("l_quantity").cast(DEC)).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).alias("win_qty"),
        )
    )
    qualified = (
        grouped.filter(
            (F.lit(2).cast(DEC) * F.col("win_qty") > F.col("total_qty"))
            & (F.col("win_qty") > F.lit(0).cast(DEC))
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").startswith(Q20_NATION_PREFIX)
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(qualified),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


QUERIES = {"rel_nested_semi_q20": q_rel_nested_semi_q20}

ORACLES = {
    "rel_nested_semi_q20": f"""
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name LIKE '{Q20_NATION_PREFIX}%'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part
                WHERE p_name LIKE '{Q20_PART_PREFIX}%'
            )
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(2 AS DECIMAL(18,6)) * sum(
                       CASE WHEN l_shipdate >= TIMESTAMP '{Q20_LO}'
                             AND l_shipdate < TIMESTAMP '{Q20_HI}'
                            THEN CAST(l_quantity AS DECIMAL(18,6))
                            ELSE CAST(0 AS DECIMAL(18,6)) END)
                   > sum(CAST(l_quantity AS DECIMAL(18,6)))
               AND sum(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_LO}'
                             AND l_shipdate < TIMESTAMP '{Q20_HI}'
                            THEN CAST(l_quantity AS DECIMAL(18,6))
                            ELSE CAST(0 AS DECIMAL(18,6)) END) > 0
          )
    """,
}
