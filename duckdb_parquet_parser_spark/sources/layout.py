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


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_col: str | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass every long-lived
    ingest pipeline needs: coalesce a directory of many (possibly tiny)
    parquet files into ceil(input_bytes / target) right-sized files,
    optionally min/max-clustering rows by ``cluster_col`` on the way.

    Scale notes: input size comes from the file listing (no data read);
    ``repartition(n)`` (not ``coalesce``) so the write parallelizes and
    each output file draws from the whole input rather than neighboring
    small files; with ``cluster_col``, ``repartitionByRange`` +
    ``sortWithinPartitions`` gives every output file a tight, disjoint
    min/max range on that column, so later scans filtering on it skip
    whole files/row groups via footer statistics (the poor man's
    Z-ordering for one dimension). Returns the file count written."""
    import glob

    files = [
        f
        for f in glob.glob(os.path.join(in_path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(in_path)
    if cluster_col is not None:
        df = df.repartitionByRange(n_out, cluster_col).sortWithinPartitions(
            cluster_col
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    return len(
        [
            f
            for f in os.listdir(out_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )
