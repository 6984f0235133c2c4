"""Physical table layout for scale: hive-partitioned writes (partition
pruning) and bucketed tables (exchange-free co-located joins).

These are the two levers that matter most at 100 TB:

- ``partitionBy`` on a low-cardinality scan predicate column means a query
  filtering on it reads only matching directories — the scan cost drops
  with selectivity, independent of table size (``PartitionFilters`` in the
  plan, asserted in tests/test_layout.py).
- ``bucketBy`` on a high-traffic join key pre-shuffles the data once at
  write time; every later equi-join/aggregation on that key skips its
  Exchange entirely (asserted: the bucketed self-join plan has no shuffle
  on the bucketed side).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

WAREHOUSE = os.path.join(tempfile.gettempdir(), "spark_graft_warehouse")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (bucket layout lives in the
    session catalog; Spark reuses the bucketing as the join/agg
    distribution)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables between sessions but their
    # managed locations persist — clear a stale one before recreating
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table
    )
    if os.path.exists(loc):
        import shutil

        shutil.rmtree(loc)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
