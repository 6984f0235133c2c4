"""Physical layout at scale: partition pruning reaches the scan, bucketed
joins skip their Exchange."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.catalog import load_table
from duckdb_parquet_parser_spark.plans import formatted_plan
from duckdb_parquet_parser_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes_partitions(spark, sf_smoke):
    path = os.path.join(tempfile.gettempdir(), "sg_part_events")
    ev = load_table(spark, sf_smoke, "events")
    write_partitioned(ev, path, ["event_type"])
    q = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "event_type" in plan
    # pruned read returns exactly the partition's rows
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert q.count() == want
    # directory layout really is hive-partitioned
    assert any(d.startswith("event_type=") for d in os.listdir(path))


def test_bucketed_join_skips_exchange(spark, sf_smoke):
    """groupBy + self-join on the bucket key: ZERO exchanges — the write-
    time bucketing satisfies every distribution requirement in the plan.
    (Auto-broadcast is disabled for the assertion: at fixture scale Spark
    would broadcast the small side, hiding what bucketing buys at 100 TB
    where neither side broadcasts.)"""
    orders = load_table(spark, sf_smoke, "orders")
    write_bucketed(orders, "orders_bkt", "o_custkey", n_buckets=8)
    bkt = spark.table("orders_bkt")
    agg = bkt.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    joined = bkt.join(agg, "o_custkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("Exchange") == 0, plan
    # values intact
    assert joined.count() == orders.count()


def test_compact_files_right_sizes_and_clusters(spark, sf_smoke, tmp_path):
    from duckdb_parquet_parser_spark.inspect import file_metadata
    from duckdb_parquet_parser_spark.sources.layout import compact_files

    frag = str(tmp_path / "sg_fragmented")
    out = str(tmp_path / "sg_compacted")
    docs = load_table(spark, sf_smoke, "documents")
    # simulate the small-files problem: shard the table into 32 tiny files
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_in >= 16

    n_out = compact_files(
        spark, frag, out, target_file_bytes=64 * 1024, cluster_col="doc_id"
    )
    files = sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert len(files) == n_out < n_in
    # round-trip: same rows
    assert (
        spark.read.parquet(out).orderBy("doc_id").collect()
        == docs.orderBy("doc_id").collect()
    )
    if len(files) > 1:
        # clustering: per-file doc_id ranges are disjoint -> footer stats
        # let a point query skip every other file
        ranges = []
        for f in files:
            meta = file_metadata(f)
            stats = meta.row_group(0).column(0).statistics
            lo, hi = stats.min, stats.max
            for rg in range(1, meta.num_row_groups):
                s = meta.row_group(rg).column(0).statistics
                lo, hi = min(lo, s.min), max(hi, s.max)
            ranges.append((lo, hi))
        ranges.sort()
        for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev < lo_next, ranges


def test_compact_files_rejects_in_place_and_empty_input(spark, tmp_path):
    import pytest

    from duckdb_parquet_parser_spark.sources.layout import compact_files

    d = str(tmp_path / "same")
    os.makedirs(d, exist_ok=True)
    with pytest.raises(ValueError, match="out_path"):
        compact_files(spark, d, d)
    with pytest.raises(FileNotFoundError, match="no input files"):
        compact_files(spark, d, str(tmp_path / "other"))


def test_clustered_prune_skips_files(spark, sf_smoke):
    """f1_clustered_prune must actually skip files: the footer-stat prune
    keeps a strict subset of the clustered layout, and the pruned read
    returns exactly the full-scan result."""
    from duckdb_parquet_parser_spark.sources.layout import (
        PRUNE_HI,
        PRUNE_LO,
        clustered_documents,
        prune_files_by_stats,
        q_f1_clustered_prune,
    )

    out = clustered_documents(spark, sf_smoke)
    keep, n_all = prune_files_by_stats(out, "doc_id", PRUNE_LO, PRUNE_HI)
    assert n_all > 1 and 0 < len(keep) < n_all, (len(keep), n_all)
    got = q_f1_clustered_prune(spark, sf_smoke)
    want = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id").between(PRUNE_LO, PRUNE_HI))
        .select("doc_id", "lang", "n_chars")
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # the residual predicate still reaches the kept files' scan
    assert "PushedFilters: [" in formatted_plan(got)


def test_zorder_prunes_both_dimensions(spark, sf_smoke):
    """The Morton layout must let footer-stat pruning skip files for range
    predicates on BOTH interleaved columns — the property 1-D range
    clustering can't provide for the second column."""
    from duckdb_parquet_parser_spark.sources.layout import (
        ZPRUNE_HI,
        ZPRUNE_LO,
        prune_files_by_stats,
        q_w_zorder_prune,
        zordered_documents,
    )

    out = zordered_documents(spark, sf_smoke)
    keep_b, n_all = prune_files_by_stats(out, "n_chars", ZPRUNE_LO, ZPRUNE_HI)
    keep_a, _ = prune_files_by_stats(out, "doc_id", 0, 99)
    assert n_all > 4
    assert 0 < len(keep_b) < n_all, (len(keep_b), n_all)
    assert 0 < len(keep_a) < n_all, (len(keep_a), n_all)
    got = q_w_zorder_prune(spark, sf_smoke)
    want = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("n_chars").between(ZPRUNE_LO, ZPRUNE_HI))
        .select("doc_id", "n_chars", "lang")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_zvalue_interleaves_exactly(spark):
    """zvalue must equal the reference Morton interleave for the full
    (13, 10)-bit domain corners and a deterministic pseudo-random sample —
    the pruning guarantees rest on this bijection."""
    from duckdb_parquet_parser_spark.sources.layout import zvalue

    def z_py(a: int, b: int, bits_a: int = 13, bits_b: int = 10) -> int:
        z = 0
        for i in range(max(bits_a, bits_b)):
            if i < bits_a:
                z |= ((a >> i) & 1) << (2 * i + 1)
            if i < bits_b:
                z |= ((b >> i) & 1) << (2 * i)
        return z

    pairs = [(0, 0), (8191, 1023), (8191, 0), (0, 1023), (1, 1)]
    seed = 1234577
    for _ in range(200):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        pairs.append((seed % 8192, (seed >> 13) % 1024))
    df = spark.createDataFrame(pairs, "a long, b long").withColumn(
        "z", zvalue(F.col("a"), F.col("b"))
    )
    for row in df.collect():
        assert row.z == z_py(row.a, row.b), (row.a, row.b, row.z)


def test_prune_files_by_stats_is_conservative(spark, sf_smoke):
    """For any band, the pruned file subset must return exactly the rows
    the full scan returns — pruning may only drop files that cannot
    match (checked over several bands incl. empty and full-range)."""
    from duckdb_parquet_parser_spark.sources.layout import (
        clustered_documents,
        prune_files_by_stats,
    )

    out = clustered_documents(spark, sf_smoke)
    full = spark.read.parquet(out)
    for lo, hi in [(0, 49), (250, 260), (499, 499), (-5, -1), (0, 10**6)]:
        keep, n_all = prune_files_by_stats(out, "doc_id", lo, hi)
        want = full.filter(F.col("doc_id").between(lo, hi)).count()
        got = (
            spark.read.parquet(*keep)
            .filter(F.col("doc_id").between(lo, hi))
            .count()
            if keep
            else 0
        )
        assert got == want, (lo, hi, got, want)
        if (lo, hi) == (0, 10**6):
            assert len(keep) == n_all  # full range keeps everything


def test_declared_bucketed_join_has_no_exchange(spark, sf_smoke):
    """The declared src_bucketed_join query: merge join fed directly by the
    bucketed layout — zero Exchange nodes on either side."""
    from duckdb_parquet_parser_spark.sources.layout import q_src_bucketed_join

    df = q_src_bucketed_join(spark, sf_smoke)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 0, plan


def test_regex_manifest_prunes_and_matches_full_scan(spark, sf_smoke):
    """The manifest-served regex query reads a STRICT subset of the layout
    files and returns exactly the rows a full scan + filter returns."""
    import glob

    from duckdb_parquet_parser_spark.sources.layout import (
        MANIFEST_PATTERN,
        clustered_documents,
        q_f1_regex_manifest,
    )

    out = clustered_documents(spark, sf_smoke)
    q = q_f1_regex_manifest(spark, sf_smoke)
    total = len(glob.glob(os.path.join(out, "*.parquet")))
    read = set(f.removeprefix("file:") for f in q.inputFiles())
    assert 0 < len(read) < total, (len(read), total)
    full = (
        spark.read.parquet(out)
        .filter(F.col("text").rlike(MANIFEST_PATTERN))
        .select("doc_id", "lang", "n_chars")
    )
    assert q.exceptAll(full).count() == 0 and full.exceptAll(q).count() == 0
    assert q.count() > 0  # the pattern really occurs at this SF


def test_regex_manifest_sidecar_is_reused_and_no_match_is_empty(
    spark, sf_smoke
):
    """Second manifest call hits the JSON sidecar (no scan), and a
    pattern with zero matches anywhere prunes ALL files — served as an
    empty frame with the layout schema, not a raised read."""
    import glob

    from duckdb_parquet_parser_spark.sources.layout import (
        _read_file_subset,
        clustered_documents,
        regex_manifest,
    )

    out = clustered_documents(spark, sf_smoke)
    man1 = regex_manifest(spark, out, "text", "never never never never")
    sidecars = glob.glob(os.path.join(out, "_regex_manifest_*.json"))
    assert sidecars  # persisted
    man2 = regex_manifest(spark, out, "text", "never never never never")
    assert man1 == man2
    keep = [f for f, m in man1.items() if m]
    assert keep == []  # the quadruple-repeat never occurs
    empty = _read_file_subset(spark, keep, out)
    assert empty.count() == 0
    assert "doc_id" in empty.columns and "text" in empty.columns


def test_layout_maintenance_accepts_fs_uris(spark, sf_smoke, tmp_path):
    """compact_files / prune_files_by_stats go through the Hadoop
    FileSystem API, so scheme-qualified URIs (here ``file:``, the same
    code path an object store takes) list, size, and prune correctly."""
    from duckdb_parquet_parser_spark.sources.layout import (
        _list_data_files,
        compact_files,
        prune_files_by_stats,
    )

    frag = f"file://{tmp_path}/frag"
    docs = load_table(spark, sf_smoke, "documents")
    docs.repartition(6).write.mode("overwrite").parquet(frag)
    listed = _list_data_files(spark, frag)
    assert len(listed) == 6 and all(sz > 0 for _, sz in listed)
    assert all(f.startswith("file:") for f, _ in listed)

    out = f"file://{tmp_path}/compacted"
    n = compact_files(spark, frag, out, target_file_bytes=1 << 40,
                      cluster_col="doc_id")
    assert n == 1
    assert spark.read.parquet(out).count() == docs.count()

    # re-fragment clustered, then prune via the URI path
    clus = f"file://{tmp_path}/clustered"
    compact_files(spark, frag, clus, target_file_bytes=1, cluster_col="doc_id")
    keep, total = prune_files_by_stats(clus, "doc_id", 0, 10, spark)
    assert 0 < len(keep) < total
    got = spark.read.parquet(*keep).filter(F.col("doc_id") <= 10).count()
    want = docs.filter(F.col("doc_id") <= 10).count()
    assert got == want

    # missing path lists empty; identical in/out still rejected
    assert _list_data_files(spark, f"file://{tmp_path}/nope") == []
