"""Full relational coverage — SURVEY.md §2.4 (absent from the reference,
required for "engine" completeness): joins (broadcast/semi/anti/as-of/
range), aggregations (hash, distinct, rollup/cube/grouping sets), window
functions, sorts/top-k, set ops, scalar functions.

Scale notes (100 TB):
- Dimension joins broadcast explicitly (`F.broadcast`) — region/nation/
  customer stay far under the broadcast threshold at any realistic scale;
  fact-fact joins shuffle on their keys and rely on AQE skew splitting.
- Aggregates are hash aggregates with map-side partial aggregation (Spark
  default); sums over doubles go through DECIMAL(18,6) for cross-engine
  determinism (see functions/__init__.py).
- Top-k = orderBy + limit → Spark plans TakeOrderedAndProject (per-
  partition heaps + driver merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import DEC, davg, dsum
from .asof import asof_join_backward

SHIP_CUTOFF = "1998-09-01"


def q_rel_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (hash agg + partial aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                "sum_disc_price",
            ),
            davg("l_quantity", n, "avg_qty"),
            davg("l_discount", n, "avg_disc"),
            n.alias("count_order"),
        )
    )


def q_rel_join_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.

    Dims broadcast; the orders⋈lineitem fact join shuffles on orderkey.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 49)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


def q_rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_rel_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with correct null semantics: every customer with
    its order count and spend, zero-filled for customers who never
    ordered.

    Scale shape: orders pre-aggregate to one row per custkey BEFORE the
    join (aggregate-below-join — the shuffle moves #customers rows, not
    #orders), then a single equi-join; at 100 TB both sides hash-partition
    on the key, no row explosion."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice", "spent"),
    )
    return (
        customer.join(
            per_cust, customer.c_custkey == per_cust.o_custkey, "left"
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
            F.coalesce("spent", F.lit(0.0)).alias("total_spent"),
        )
    )


def q_rel_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = (
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    prev = F.lag("o_orderkey", 1).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        run.alias("running_total"),
        prev.alias("prev_orderkey"),
    )


def q_rel_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    )


def q_rel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct()


def q_rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.select(F.col("o_custkey").alias("custkey"))
    b = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


def q_rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.select(F.col("c_custkey").alias("custkey"))
    b = orders.select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)  # EXCEPT (distinct) semantics, matches SQL EXCEPT


def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, CAST(date_trunc('DAY', ts) AS DATE) AS day,
               count(*) AS n
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
        """
    )


def q_rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
    )


def q_rel_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/JSON scalar coverage on events (§2.4 scalar fns)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.length("event_type").alias("type_len"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.floor("value").cast("long").alias("value_floor"),
        F.ceil("value").cast("long").alias("value_ceil"),
        F.abs(F.col("value") - 250).alias("value_centered"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def q_rel_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    return (
        orders.select(
            "o_orderkey",
            bucket.alias("size_bucket"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")
            ).alias("status_or_pending"),
        )
    )


def q_rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each purchase matched to the user's latest signup at
    or before the purchase time (oracle: DuckDB ASOF JOIN)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof_join_backward(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts"],
        how="inner",
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("signup_ts"),
    )


def q_rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a small banded dimension — planned as
    a broadcast nested-loop, the right strategy for tiny band tables."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("b0", 0.0, 50.0), ("b1", 50.0, 150.0), ("b2", 150.0, 300.0), ("b3", 300.0, 1e9)],
        "band string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    )


def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — at scale an implicit pivot costs an
    extra distinct pass over the key column): qty by returnflag ×
    linestatus, one column per status."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


def q_rel_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation/distribution window functions: lag, lead, ntile,
    first_value and nth_value over each user's event timeline (running
    ANSI default frame on both engines)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.ntile(4).over(w).alias("quartile"),
        F.first_value("value").over(w).alias("first_value"),
        F.nth_value("value", 3).over(w).alias("third_value"),
    )


def q_rel_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery forms through the SQL surface: correlated scalar subquery,
    IN-subquery and correlated EXISTS (Catalyst de-correlates all three
    into joins — no per-row re-execution at scale)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c.c_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 400000)
          AND EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
        """
    )


def q_rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (ANSI PERCENTILE_CONT
    semantics on both engines), rounded to the engine-wide 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("qty_p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias(
            "price_p25"
        ),
        F.count(F.lit(1)).alias("n"),
    )


Q3_DATE = "1998-01-01"


def q_rel_join_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective dim filter broadcast into a
    fact-fact join, grouped revenue, deterministic top-10.

    Scale shape: the filtered customer segment broadcasts; orders⋈lineitem
    shuffles once on orderkey; the top-10 is TakeOrderedAndProject
    (per-partition heaps + driver merge — no global sort). Tie-break
    includes l_orderkey so LIMIT is engine-independent."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


UPSERT_NEW_KEY_OFFSET = 100_000_000


def q_rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (upsert) expressed as anti-join + union — the engine-level
    rewrite every lakehouse MERGE INTO lowers to: rows whose key appears in
    the updates batch take the update, everything else passes through, new
    keys append.

    The updates batch is derived deterministically from the base table
    (price-doubled rows for keys ≡ 0 mod 10; inserted rows for keys ≡ 0
    mod 97 at a disjoint key offset) so both engines build byte-identical
    inputs. Scale shape: ONE shuffle on the merge key for the anti-join
    (broadcast when the batch is small — the common CDC case), union is
    shuffle-free; with both sides bucketed on the key (src_bucketed_join's
    layout) even that exchange disappears."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    upd = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    ins = base.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + UPSERT_NEW_KEY_OFFSET).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    updates = upd.unionByName(ins)
    return base.join(updates, "o_orderkey", "left_anti").unionByName(updates)


Q19_BRANCHES = (
    # (brand, max p_size, quantity lo, quantity hi) — three conjunctive
    # branches OR'd together, TPC-H Q19's shape on this fixture's columns
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#4", 15, 20, 30),
)


def q_rel_disjunctive_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): a disjunction of conjunctive
    predicates spanning BOTH join sides — the classic test of how an
    optimizer handles OR across a join. One row out: total revenue and
    the matched line count.

    Scale shape: part is the broadcast dimension; Catalyst splits the
    OR into per-table implied filters (each branch constrains p_brand /
    p_size on one side and l_quantity on the other, so a superset
    disjunction of single-table conjuncts is inferred and pushed below
    the join on both sides — `PushedFilters: [Or(And(...)))]` on BOTH
    scans, asserted in tests/test_plans.py), then evaluates the exact
    predicate once per joined row. The aggregate is a DECIMAL-cast sum
    (order-independent, engine-identical — the dsum convention)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = None
    for brand, size_hi, q_lo, q_hi in Q19_BRANCHES:
        branch = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = branch if cond is None else (cond | branch)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "rel_disjunctive_q19": q_rel_disjunctive_q19,
    "rel_agg_q1": q_rel_agg_q1,
    "rel_join_q3": q_rel_join_q3,
    "rel_merge_upsert": q_rel_merge_upsert,
    "rel_join_q5": q_rel_join_q5,
    "rel_join_semi": q_rel_join_semi,
    "rel_join_anti": q_rel_join_anti,
    "rel_outer_join": q_rel_outer_join,
    "rel_window_rank": q_rel_window_rank,
    "rel_window_running": q_rel_window_running,
    "rel_sort_topk": q_rel_sort_topk,
    "rel_union": q_rel_union,
    "rel_intersect": q_rel_intersect,
    "rel_except": q_rel_except,
    "rel_rollup": q_rel_rollup,
    "rel_cube": q_rel_cube,
    "rel_grouping_sets": q_rel_grouping_sets,
    "rel_distinct": q_rel_distinct,
    "rel_scalar_funcs": q_rel_scalar_funcs,
    "rel_case_expr": q_rel_case_expr,
    "rel_asof_join": q_rel_asof_join,
    "rel_range_join": q_rel_range_join,
    "rel_pivot": q_rel_pivot,
    "rel_window_lag": q_rel_window_lag,
    "rel_subquery": q_rel_subquery,
    "rel_percentiles": q_rel_percentiles,
}

_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
    f" AND l_quantity BETWEEN {lo} AND {hi})"
    for b, s, lo, hi in Q19_BRANCHES
)

ORACLES = {
    "rel_disjunctive_q19": f"""
        SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_Q19_PRED}
    """,
    "rel_join_q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
          AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "rel_merge_upsert": f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ),
        updates AS (
            SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
            FROM base WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + {UPSERT_NEW_KEY_OFFSET}, o_custkey,
                   o_totalprice
            FROM base WHERE o_orderkey % 97 = 0
        )
        SELECT b.o_orderkey, b.o_custkey, b.o_totalprice
        FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM updates u
                          WHERE u.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice FROM updates
    """,
    "rel_agg_q1": f"""
        SELECT l_returnflag, l_linestatus,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
            round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
            round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_join_q5": """
        SELECT r_name, n_name,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
            count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "rel_join_semi": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
    "rel_join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "rel_outer_join": """
        WITH per_cust AS (
            SELECT o_custkey, count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                       AS spent
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_mktsegment,
               CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders,
               COALESCE(spent, 0.0) AS total_spent
        FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
    """,
    "rel_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
            FROM orders
        ) WHERE rn <= 2
    """,
    "rel_window_running": """
        SELECT o_custkey, o_orderkey,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS running_total,
            lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        FROM orders
    """,
    "rel_sort_topk": """
        SELECT p_partkey, p_name, p_retailprice FROM part
        ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
    "rel_union": """
        SELECT DISTINCT custkey FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    "rel_intersect": """
        SELECT o_custkey AS custkey FROM orders
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
    "rel_except": """
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders
    """,
    "rel_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "rel_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "rel_grouping_sets": """
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
    """,
    "rel_distinct": """
        SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        FROM lineitem
    """,
    "rel_scalar_funcs": """
        SELECT event_id,
               upper(event_type) AS type_upper,
               substr(event_type, 1, 3) AS type_prefix,
               CAST(length(event_type) AS INT) AS type_len,
               concat(event_type, '-', CAST(user_id AS VARCHAR)) AS type_user,
               CAST(year(ts) AS INT) AS y,
               CAST(month(ts) AS INT) AS m,
               CAST(day(ts) AS INT) AS d,
               CAST(hour(ts) AS INT) AS h,
               CAST(floor(value) AS BIGINT) AS value_floor,
               CAST(ceil(value) AS BIGINT) AS value_ceil,
               abs(value - 250) AS value_centered,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events WHERE event_id % 100 = 0
    """,
    "rel_case_expr": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 1000 THEN 'small'
                    WHEN o_totalprice < 10000 THEN 'medium'
                    ELSE 'large' END AS size_bucket,
               coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending
        FROM orders
    """,
    "rel_asof_join": """
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    "rel_range_join": """
        WITH bands(band, lo, hi) AS (
            VALUES ('b0', 0.0, 50.0), ('b1', 50.0, 150.0),
                   ('b2', 150.0, 300.0), ('b3', 300.0, 1e9)
        )
        SELECT band, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
    "rel_pivot": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS qty_f,
               CAST(sum(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS qty_o
        FROM lineitem GROUP BY l_returnflag
    """,
    "rel_window_lag": """
        SELECT event_id, user_id,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               first_value(value) OVER w AS first_value,
               nth_value(value, 3) OVER w AS third_value
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rel_subquery": """
        SELECT c.c_custkey, c.c_name,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c.c_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 400000)
          AND EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    """,
    "rel_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
               round(quantile_cont(l_quantity, 0.95), 6) AS qty_p95,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
}
