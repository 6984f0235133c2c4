"""Round-11 TPC-H additions: Q20 (nested semi-join + correlated grouped
threshold — the one common correlated-subquery pattern not yet in the
§2.4 family, VERDICT r10 #8; complements Q4/Q17/Q18/Q21/Q22 in
relational_sub.py), Q7 (bilateral nation-pair volume by ship year) and
Q8 (national market share as a one-pass conditional aggregate).

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
from ..functions import DEC, dsum

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


Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_7"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"

Q8_REGION = "ASIA"
Q8_SHARE_NATION = "NATION_12"
Q8_PART_TYPE = "PROMO"


def q_rel_volume_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral volume: revenue shipped between two
    nations (either direction), by supplier nation, customer nation and
    ship year. The two nation dims are filtered BEFORE touching the
    facts, so supplier and customer shrink to the two-nation subsets
    and broadcast; the only big exchange is the lineitem⋈orders
    orderkey join — the canonical Q7 plan. Revenue follows the
    engine-wide DECIMAL discipline (dsum)."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cross_pair = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(cross_pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_rel_mktshare_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: of the order volume that
    ``Q8_REGION`` customers spent on ``Q8_PART_TYPE`` parts, the share
    supplied by ``Q8_SHARE_NATION``, per order year. The share is a
    conditional aggregate over ONE grouped pass (sum-if / sum), not a
    self-join; both volume sums are exact DECIMAL (identical in both
    engines), and only the final share divides — the same
    double-of-exact-decimals discipline as davg, rounded to 9 places."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    cust_nations = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(cust_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").withColumnRenamed(
                    "n_name", "supp_nation"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_PART_TYPE)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_share = F.col("supp_nation") == Q8_SHARE_NATION
    grouped = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust).withColumnRenamed("c_custkey", "ck"),
            F.col("o_custkey") == F.col("ck"),
            "left_semi",
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(is_share, volume.cast(DEC)).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast("double")
            .alias("nation_volume"),
            F.sum(volume.cast(DEC)).cast("double").alias("total_volume"),
        )
    )
    return grouped.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(
            F.col("nation_volume") / F.col("total_volume"), 9
        ).alias("mkt_share"),
    )


QUERIES = {
    "rel_nested_semi_q20": q_rel_nested_semi_q20,
    "rel_volume_q7": q_rel_volume_q7,
    "rel_mktshare_q8": q_rel_mktshare_q8,
}

ORACLES = {
    "rel_volume_q7": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier, lineitem, orders, customer,
                 nation n1, nation n2
            WHERE s_suppkey = l_suppkey
              AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = '{Q7_NATION_A}'
                    AND n2.n_name = '{Q7_NATION_B}')
                OR (n1.n_name = '{Q7_NATION_B}'
                    AND n2.n_name = '{Q7_NATION_A}'))
              AND l_shipdate >= TIMESTAMP '{Q7_LO}'
              AND l_shipdate < TIMESTAMP '{Q7_HI}'
        )
        GROUP BY 1, 2, 3
    """,
    "rel_mktshare_q8": f"""
        SELECT o_year, nation_volume, total_volume,
               ROUND(nation_volume / total_volume, 9) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   CAST(sum(CASE WHEN n1.n_name = '{Q8_SHARE_NATION}'
                            THEN CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(18,6))
                            ELSE CAST(0 AS DECIMAL(18,6)) END)
                        AS DOUBLE) AS nation_volume,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE)
                       AS total_volume
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_type = '{Q8_PART_TYPE}'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey IN (
                SELECT c_custkey
                FROM customer
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region ON n2.n_regionkey = r_regionkey
                WHERE r_name = '{Q8_REGION}'
            )
            GROUP BY 1
        )
    """,
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
