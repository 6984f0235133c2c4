"""Round-12 TPC-H additions (VERDICT r11 missing #3): Q2 (min-per-group
correlated subquery over a dimension join) and Q11 (group share of a
global scalar aggregate) — the last two common correlated shapes not yet
in the §2.4 family, small variations on certified machinery (Q17's
grouped threshold, Q22's broadcast scalar).

The fixture set has no partsupp table (the Q20 adaptation precedent,
relational_q20.py): the supply relationship is lineitem's
``(l_suppkey, l_partkey)`` groups, and "supply cost" is the minimum
extended price the supplier ever shipped that part at —
``min(CAST(l_extendedprice AS DECIMAL))``, exact and order-independent
in both engines (no division, no float accumulation).

- **Q2**: for each ``P_SIZE``-filtered part, the ``Q2_REGION`` suppliers
  whose supply cost equals the REGIONAL MINIMUM for that part. The
  oracle keeps TPC-H's correlated scalar subquery verbatim; the Spark
  plan is the decorrelation Catalyst would aim for, written directly:
  one fact exchange (the (partkey, suppkey) MIN aggregate over the
  part-pruned, supplier-pruned scan), then a per-part MIN over that
  small frame broadcast back as an equi-join on (partkey, cost). Ties
  keep every achieving supplier — Q2 semantics.
- **Q11**: per-part shipped value over the ``Q11_NATION_PREFIX``
  supplier band, keeping parts whose value clears a threshold derived
  from the GLOBAL aggregate — the correlated HAVING over a scalar. The
  threshold is scale-free (≥ 20% above the average part value,
  cross-multiplied: ``val × n_parts × 10 > 12 × total``) so both engines
  compare exact DECIMAL-by-integer products and the query stays
  selective at every SF; only the output column casts to double. The
  global (total, n_parts) row is a 1-row broadcast off the SAME
  materialized per-part aggregate (one fact exchange; the
  self-join-recompute lesson — checkpoint the grouped frame once, both
  consumers reuse it).

This lives in its own module: relational_q20.py's three queries are
r11-driver-certified with unchanged plans, and the changed-module
re-certification rule (operators/__init__.py) must not pull them back
into the 50-slot window for additions sharing nothing but a loader.

Scale notes (100 TB): both queries filter and broadcast every dimension
before the fact table, so lineitem shuffles exactly once each (the
grouped aggregate with map-side partials); Q2's join-back frame is
|filtered parts| rows and Q11's threshold is one row — both broadcast.
No windows over the fact, no second fact exchange, no correlated
re-execution (the oracle's correlated subquery is the sf0.01 yardstick,
never the plan).

Reference analog: none (the reference has no relational operators);
TPC-H Q2/Q11 semantics re-derived from the public spec against the
driver's fixture schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import DEC
from ..session import checkpoint_df

Q2_REGION = "ASIA"
Q2_PART_SIZE = 15

Q11_NATION_PREFIX = "NATION_1"  # NATION_1, NATION_10..NATION_19
# TPC-H's literal fraction (0.0001/SF) is scale-DEPENDENT by design — a
# fixed denominator returns everything at sf0.001 and nothing at sf0.1.
# The scale-free mirror keeps parts ≥ 20% above the AVERAGE part value:
# val × n_parts × DEN > NUM × total, cross-multiplied so both engines
# compare exact DECIMAL×integer products (no division, no floats).
Q11_THRESH_NUM, Q11_THRESH_DEN = 12, 10


def _q2_supply(li: DataFrame, parts: DataFrame, region_supp: DataFrame) -> DataFrame:
    """The un-checkpointed fact aggregate (split out so the plan test can
    assert the p_size pushdown + map-side partial_min BELOW the lineage
    cut the query itself makes)."""
    return (
        li.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            F.broadcast(region_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("cost"))
    )


def q_rel_min_supplycost_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped regional minimum-cost supplier per part: the
    correlated ``cost = (SELECT min(cost) ... WHERE same part)`` written
    as its decorrelated plan — grouped MIN, per-part MIN of that,
    broadcast equi-join back on (part, cost)."""
    region_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == Q2_REGION
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == Q2_PART_SIZE)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # part prune FIRST (size filter: 2% of parts), then the supplier
    # attribute join (region band, broadcast) — the one fact exchange is
    # the (partkey, suppkey) MIN over the doubly-pruned scan.
    # checkpointed: TWO consumers (the per-part min and the join-back)
    # would otherwise each re-run the fact scan + aggregate — the
    # self-join-recompute lesson. The frame is |filtered parts × region
    # suppliers| rows at most: cheap to materialize at any scale.
    supply = checkpoint_df(_q2_supply(li, parts, region_supp), eager=True)
    per_part_min = supply.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        supply.join(
            F.broadcast(per_part_min),
            (F.col("l_partkey") == F.col("mp"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


def _q11_grouped(li: DataFrame, band_supp: DataFrame) -> DataFrame:
    """Un-checkpointed per-part value aggregate (plan-test seam, as
    ``_q2_supply``): broadcast left-semi prune, then ONE fact exchange
    with a map-side partial sum."""
    return (
        li.join(
            F.broadcast(band_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("val"))
    )


def q_rel_value_share_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock selection: per-part shipped value
    over the nation-band suppliers, kept when value × DEN > global total
    (exact DECIMAL cross-multiplication; the scalar total is a 1-row
    broadcast off the same checkpointed aggregate)."""
    band_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name").startswith(Q11_NATION_PREFIX)
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    grouped = checkpoint_df(_q11_grouped(li, band_supp), eager=True)
    total = grouped.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        grouped.join(F.broadcast(total))
        .filter(
            F.col("val") * F.col("n_parts") * F.lit(Q11_THRESH_DEN)
            > F.lit(Q11_THRESH_NUM) * F.col("total")
        )
        .select(
            "l_partkey", F.col("val").cast("double").alias("part_value")
        )
    )


Q16_EXCL_BRAND = "Brand#11"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 4, 9, 15, 23, 36, 45, 49)


def q_rel_supplier_cnt_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity: per (brand, type, size) of
    the negatively-filtered part family, how many DISTINCT suppliers
    ship it — excluding flagged suppliers (negative balance, the
    fixture's stand-in for Q16's complaint-comment scan). The exclusion
    is a broadcast LEFT ANTI join; the oracle spells the same semantics
    as NOT EXISTS (not the spec's NOT IN: under the randomized NULL-key
    fixtures NOT IN's three-valued logic empties the result when the
    subquery holds a NULL, while anti-join/NOT EXISTS keep unmatched
    rows — the two engines must agree on ONE semantics, documented
    here). The distinct aggregate is Spark's standard two-phase plan:
    partial dedup on (group keys, suppkey), exchange, count — the only
    fact-table exchanges, both on the pre-aggregated frame."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & ~F.col("p_type").startswith(Q16_EXCL_TYPE_PREFIX)
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


QUERIES = {
    "rel_min_supplycost_q2": q_rel_min_supplycost_q2,
    "rel_value_share_q11": q_rel_value_share_q11,
    "rel_supplier_cnt_q16": q_rel_supplier_cnt_q16,
}

ORACLES = {
    # The correlated scalar subquery kept verbatim — the shape Q2 exists
    # to test; DuckDB evaluates it as written.
    "rel_min_supplycost_q2": f"""
        WITH rs AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{Q2_REGION}'
        ), ps AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost
            FROM lineitem JOIN rs ON l_suppkey = s_suppkey
            GROUP BY 1, 2
        )
        SELECT ps.l_partkey AS p_partkey, ps.l_suppkey AS s_suppkey,
               rs.s_name, rs.n_name, rs.s_acctbal,
               CAST(ps.cost AS DOUBLE) AS supply_cost
        FROM ps
        JOIN part ON ps.l_partkey = p_partkey AND p_size = {Q2_PART_SIZE}
        JOIN rs ON ps.l_suppkey = rs.s_suppkey
        WHERE ps.cost = (
            SELECT min(p2.cost) FROM ps p2
            WHERE p2.l_partkey = ps.l_partkey
        )
    """,
    "rel_value_share_q11": f"""
        WITH v AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name LIKE '{Q11_NATION_PREFIX}%'
            )
            GROUP BY 1
        )
        SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        FROM v
        WHERE val * (SELECT count(*) FROM v) * {Q11_THRESH_DEN}
              > {Q11_THRESH_NUM} * (SELECT sum(val) FROM v)
    """,
    # NOT EXISTS, not NOT IN — anti-join semantics on NULL keys (see the
    # query docstring); sizes list interpolated from the one constant.
    "rel_supplier_cnt_q16": f"""
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{Q16_EXCL_BRAND}'
          AND p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
          AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
          AND NOT EXISTS (
              SELECT 1 FROM supplier
              WHERE s_suppkey = l_suppkey AND s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """,
}
