"""Correlated-subquery relational family + time-RANGE window frames —
round-4 additions deepening SURVEY.md §2.4 beyond the round-3 surface
(the reference has no relational operators at all; these cover the
subquery shapes TPC-H exercises that `rel_subquery` does not: correlated
EXISTS with a non-equi predicate, correlated scalar aggregate, and
IN-over-grouped-HAVING — plus event-time RANGE window frames, the one
window frame kind `rel_window_running` (ROWS) does not).

Certification note: declared this round, parked behind the driver's
50-query window (operators/__init__.py ROTATION_TAIL — the window is
full with the round-2 re-certification rotation); differential-tested
locally at sf0.001 via tests/test_oracle_parity.py like every other
query, driver-certified when the window rotates in round 5.

Scale notes (100 TB):
- Correlated subqueries are expressed as the joins Catalyst decorrelates
  them to anyway: EXISTS → left-semi join (here with a non-equi time
  predicate riding the orderkey equi-join), scalar-agg → pre-aggregated
  broadcast/shuffle join on the correlation key. Writing the join
  directly keeps the plan explicit — one shuffle on the correlation key,
  map-side partial aggregation below it.
- The Q17-shaped per-part threshold is rearranged to integer-free DECIMAL
  cross-multiplication (5·qty·n < Σqty) so no division happens anywhere —
  exact, order-independent, and identical in both engines.
- The RANGE frame orders by `unix_micros(ts)` — a numeric, shuffle-local
  window; Spark's range frame is per-partition sort + sliding aggregate,
  no second shuffle after the partitionBy hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import DEC, dsum

Q4_LO, Q4_HI = "1996-01-01", "1996-04-01"
Q4_LATE_DAYS = 60
Q18_MIN_QTY = 250
RANGE_WINDOW_US = 3_600_000_000  # 1 hour in microseconds
Q21_LATE_DAYS = 45
Q21_NATION_PREFIX = "NATION_1"  # NATION_1, NATION_10..NATION_19
Q21_TOP_N = 100


def q_rel_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: count orders per priority in
    one quarter having at least one lineitem shipped more than
    ``Q4_LATE_DAYS`` after the order date. The correlated EXISTS is a
    left-semi join on orderkey with the lateness predicate as a residual
    non-equi condition — exactly Catalyst's decorrelation, written out."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
    )
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_rel_corr_scalar_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: per brand, the lineitems
    whose quantity is below 20% of that part's average quantity. The
    correlated scalar subquery (per-partkey AVG) is a pre-aggregation
    joined back on partkey; the threshold compare is DECIMAL
    cross-multiplied (5·qty·n < Σqty) so both engines evaluate it
    exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    below = (
        F.lit(5).cast(DEC) * F.col("l_quantity").cast(DEC) * F.col("qty_n")
        < F.col("qty_sum")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(below)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            dsum("l_extendedprice", "small_qty_revenue"),
        )
    )


def q_rel_group_in_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders whose total lineitem
    quantity exceeds ``Q18_MIN_QTY`` (the IN-over-grouped-HAVING shape),
    top 10 by total quantity. The grouped HAVING side aggregates lineitem
    first (map-side partials on orderkey), then joins orders — the join
    carries the aggregate, so no second pass over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_rel_multi_exists_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped "suppliers who kept orders waiting": for finished
    ('F') orders, count per supplier the late lineitems where ANOTHER
    supplier participated in the order (EXISTS) but NO other supplier was
    late (NOT EXISTS) — the classic double-correlated self-join, the one
    subquery shape Q4/Q17/Q18 above do not cover. The synthetic lineitem
    has no commit/receipt dates, so "late" is l_shipdate more than
    ``Q21_LATE_DAYS`` days after o_orderdate (the Q4 lateness convention).

    Plan shape (the 100 TB contract): the textbook decorrelation — a
    left-semi plus a left-anti self-join on orderkey — was written out
    and measured first: Catalyst specializes each correlation side
    (prunes the late flag off the EXISTS side, pushes the lateness
    filter below the NOT-EXISTS side), so the "shared" base resolves to
    THREE lineitem scans and THREE orderkey exchanges with no
    ReusedExchange, however the sides are spelled. The shape that
    genuinely shares one shuffle is the window rewrite: partition the
    fact rows by l_orderkey ONCE and answer both correlated predicates
    from that single exchange — EXISTS(other supplier) ⇔ min(suppkey) ≠
    max(suppkey) over the order, NOT EXISTS(other LATE supplier) ⇔ the
    late suppliers' min = max (the current row is itself late, so one
    distinct late supplier means "only me"). One scan, one orderkey
    exchange, one Window node with four bounded aggregates, no
    cartesian (asserted in tests/test_plans.py). Supplier and nation
    are broadcast dims; the final count is one groupBy on s_name with
    TakeOrderedAndProject for the top-N.

    Assumption (ADVICE r8): the rewrite partitions by l_orderkey only,
    which matches the EXISTS/NOT-EXISTS oracle iff o_orderkey is UNIQUE
    in orders — duplicate orderkeys would mix lateness flags computed
    against different o_orderdate values inside one window partition.
    o_orderkey is the orders primary key in TPC-H and in every testdata/
    randomized generator here (okeys = range(1, n+1)); a deployment whose
    orders table is not key-unique must pre-aggregate orders to one row
    per orderkey (or partition by (l_orderkey, o_orderdate)) first."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
    )
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    late_sk = F.when(F.col("late"), F.col("l_suppkey"))
    has_other = F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w)
    only_me_late = F.min(late_sk).over(w) == F.max(late_sk).over(w)
    waiting = (
        base.select("l_orderkey", "l_suppkey", "late",
                    has_other.alias("has_other"),
                    only_me_late.alias("only_me_late"))
        .filter(F.col("late") & F.col("has_other") & F.col("only_me_late"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").startswith(Q21_NATION_PREFIX))
        .select("n_nationkey")
    )
    return (
        waiting.join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(Q21_TOP_N)
    )


def q_rel_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per user, the rolling 1-hour sum of
    event value (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    — the frame kind that follows the time axis, not row counts, so ties
    and gaps behave correctly. Ordered by ``unix_micros(ts)``: exact
    integer microseconds, so the frame bound arithmetic is identical in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(ts))
        .rangeBetween(-RANGE_WINDOW_US, 0)
    )
    rolling = F.sum(F.col("value").cast(DEC)).over(w).cast("double")
    return ev.select(
        "event_id", "user_id", "ts", rolling.alias("rolling_1h_value")
    )


Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"
Q22_URGENT_PRIORITY = "1-URGENT"


def q_rel_outer_hist_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer-order distribution: how many customers
    placed exactly k qualifying orders, INCLUDING k = 0 — the count-of-
    counts / outer-join-histogram shape no other §2.4 query covers (the
    reference Q13 filters by comment pattern; the synthetic orders table
    carries that role on ``o_orderpriority``).

    Plan shape (100 TB): the filter lives on the join's RIGHT side only,
    so it pushes into the orders scan; orders pre-aggregate to ONE row per
    custkey BEFORE the left join (the shuffle moves |customers| rows, not
    |orders|); the zero-fill happens via coalesce after the outer join;
    the second aggregation's key space is tiny (distinct order counts), so
    the histogram agg is map-side-partial then a near-empty exchange.

    Declared round 9 INSIDE the certification head (never-certified
    queries must sit in the head — it displaced ns_tfidf_topterms /
    udf_grouped_agg to the tail) and driver-certified green in r9."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .select("o_custkey")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    counts = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_rel_anti_avg_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sales opportunity: per nation, count and total
    balance of customers whose account balance beats the global average of
    POSITIVE balances and who never placed an urgent order — the
    anti-join + uncorrelated-scalar-AVG-subquery pair no other query
    covers (the synthetic customer has no phone column, so nationkey
    plays the country-code role; "no order at all" is degenerate on this
    data — every customer ordered — hence the urgent-order predicate).

    Plan shape (100 TB): the AVG subquery aggregates to ONE row and rides
    a broadcast cross-join; the threshold is DECIMAL cross-multiplied
    (bal × n > Σ) so no division and no float comparison anywhere (the
    Q17 trick — exact and engine-identical); the NOT EXISTS is a left-anti
    join on custkey against the priority-filtered orders scan (filter
    pushed down); one final hash agg on nationkey."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    pos = customer.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_n"),
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == Q22_URGENT_PRIORITY)
        .select("o_custkey")
    )
    rich = customer.crossJoin(F.broadcast(thresh)).filter(
        F.col("c_acctbal").cast(DEC) * F.col("bal_n") > F.col("bal_sum")
    )
    inactive = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        inactive.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


QUERIES = {
    "rel_exists_q4": q_rel_exists_q4,
    "rel_corr_scalar_q17": q_rel_corr_scalar_q17,
    "rel_group_in_q18": q_rel_group_in_q18,
    "rel_multi_exists_q21": q_rel_multi_exists_q21,
    "rel_window_range_time": q_rel_window_range_time,
    "rel_outer_hist_q13": q_rel_outer_hist_q13,
    "rel_anti_avg_q22": q_rel_anti_avg_q22,
}

ORACLES = {
    "rel_exists_q4": f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
          AND o_orderdate < TIMESTAMP '{Q4_HI}'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
          )
        GROUP BY o_orderpriority
    """,
    "rel_corr_scalar_q17": """
        WITH pa AS (
            SELECT l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty_sum,
                   count(*) AS qty_n
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p.p_brand,
               count(*) AS n_small_lines,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS small_qty_revenue
        FROM lineitem l
        JOIN pa ON pa.l_partkey = l.l_partkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE CAST(5 AS DECIMAL(18,6)) * CAST(l.l_quantity AS DECIMAL(18,6))
                  * pa.qty_n
              < pa.qty_sum
        GROUP BY p.p_brand
    """,
    "rel_group_in_q18": f"""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                       AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   > {Q18_MIN_QTY}
        )
        SELECT o_orderkey, o_custkey, o_totalprice, total_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 10
    """,
    "rel_multi_exists_q21": f"""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
          AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
          )
          AND s_nationkey = n_nationkey
          AND n_name LIKE '{Q21_NATION_PREFIX}%'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT {Q21_TOP_N}
    """,
    "rel_window_range_time": """
        SELECT event_id, user_id, ts,
               CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_1h_value
        FROM events
    """,
    "rel_outer_hist_q13": f"""
        WITH pc AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM pc GROUP BY c_count
    """,
    "rel_anti_avg_q22": f"""
        WITH t AS (
            SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS bal_sum,
                   count(*) AS bal_n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS totacctbal
        FROM customer c, t
        WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * t.bal_n > t.bal_sum
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '{Q22_URGENT_PRIORITY}'
          )
        GROUP BY c_nationkey
    """,
}
