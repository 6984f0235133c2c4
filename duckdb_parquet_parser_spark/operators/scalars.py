"""Extended scalar/collection function coverage — §2.4 scalar-functions row
(the reference exposes expression evaluation through its query surface;
these queries widen the verified function inventory beyond
``relational.q_rel_scalar_funcs``).

Two function-dense declared queries, both pure built-in expressions (JVM
whole-stage codegen, zero Python):

- ``rel_date_string_funcs``: date arithmetic (date_add / datediff /
  last_day / trunc / add_months / dayofweek / date_format) and string
  surgery (split_part / lpad / translate) over orders.
- ``rel_json_map_funcs``: schema-full JSON parsing (``from_json``) plus the
  array/map algebra — collect_list/struct → map_from_entries → explode
  round-trip, collect_set / sort_array / array_contains / element_at /
  size — over events, grouped per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_rel_date_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("eom"),
        F.trunc(d, "month").alias("month_start"),
        F.add_months(d, 2).alias("plus_2m"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.datediff(d, F.lit("1992-01-01").cast("date")).alias("days_since_92"),
        F.datediff(F.last_day(d), d).alias("days_to_eom"),
        F.dayofweek(d).alias("dow"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias(
            "prio_word"
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.translate("o_orderpriority", "-", " ").alias("prio_spaced"),
    )


def q_rel_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    parsed = ev.withColumn(
        "prop_k", F.from_json("props", "k BIGINT").getField("k")
    )
    per_type = parsed.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("prop_k").alias("sum_k")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("event_type"),
                        F.struct(
                            F.col("cnt").alias("cnt"),
                            F.col("sum_k").alias("sum_k"),
                        ).alias("stats"),
                    )
                )
            )
        ).alias("type_stats"),
        F.sort_array(F.collect_set("event_type")).alias("types"),
    )
    return per_user.select(
        "user_id",
        F.explode("type_stats").alias("etype", "stats"),
        F.size("types").alias("n_types"),
        F.array_contains("types", "purchase").alias("has_purchase"),
        F.element_at("types", 1).alias("first_type"),
    ).select(
        "user_id",
        "etype",
        F.col("stats.cnt").alias("cnt"),
        F.col("stats.sum_k").alias("sum_k"),
        "n_types",
        "has_purchase",
        "first_type",
    )


QUERIES = {
    "rel_date_string_funcs": q_rel_date_string_funcs,
    "rel_json_map_funcs": q_rel_json_map_funcs,
}

ORACLES = {
    # DuckDB dayofweek is Sunday=0; Spark is Sunday=1 — offset in the oracle
    "rel_date_string_funcs": """
        WITH o AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(o_orderdate AS DATE) AS d
            FROM orders WHERE o_orderkey % 20 = 0
        )
        SELECT o_orderkey,
               d + 30 AS due_date,
               last_day(d) AS eom,
               CAST(date_trunc('month', d) AS DATE) AS month_start,
               CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2m,
               strftime(d, '%Y-%m') AS ym,
               CAST(date_diff('day', DATE '1992-01-01', d) AS INT)
                   AS days_since_92,
               CAST(date_diff('day', d, last_day(d)) AS INT) AS days_to_eom,
               CAST(dayofweek(d) + 1 AS INT) AS dow,
               split_part(o_orderpriority, '-', 2) AS prio_word,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
               translate(o_orderpriority, '-', ' ') AS prio_spaced
        FROM o
    """,
    # the Spark side round-trips per-type stats through map_from_entries →
    # explode; semantically that is identity, so the oracle states the
    # grouped semantics directly
    "rel_json_map_funcs": """
        WITH parsed AS (
            SELECT user_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
            FROM events WHERE user_id < 40
        ),
        per_type AS (
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(prop_k) AS BIGINT) AS sum_k
            FROM parsed GROUP BY user_id, event_type
        ),
        per_user AS (
            SELECT user_id,
                   CAST(count(*) AS INT) AS n_types,
                   bool_or(event_type = 'purchase') AS has_purchase,
                   min(event_type) AS first_type
            FROM per_type GROUP BY user_id
        )
        SELECT t.user_id, t.event_type AS etype, t.cnt, t.sum_k,
               u.n_types, u.has_purchase, u.first_type
        FROM per_type t JOIN per_user u USING (user_id)
    """,
}
