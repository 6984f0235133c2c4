"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 / §2.4 / §2.5,
one callable ``(spark, sf_dir) -> DataFrame`` each.
``oracle_sql()`` — the DuckDB-equivalent SQL per query (differential
correctness gate at sf0.01).

Implementations live in ``duckdb_parquet_parser_spark``; this module only
adapts them to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_parquet_parser_spark.operators import collect_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: scan lineitem → regex filter → project → aggregate
    (the minimum end-to-end slice from SURVEY.md §7.2: the reference's F1
    regex filter composed with a pricing aggregation)."""
    from duckdb_parquet_parser_spark.operators.relational import q_rel_agg_q1

    return q_rel_agg_q1(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = collect_queries()
    return qs


def oracle_sql() -> dict[str, str]:
    _, oracles = collect_queries()
    return oracles
