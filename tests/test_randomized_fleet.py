"""Randomized MANY-FILE differential for the distributed fleet audit
(VERDICT r13 #7): ``r6_fleet_audit``'s registered query walks the ~10
fixture tables, which certifies the byte arithmetic but never exercises
the 100 TB story — executors walking page headers across a large file
LISTING. This family generates 100+ parquet files per seed with
randomized shapes (row counts, column mixes incl. nulls and a nested
list column, row-group sizes, dictionary on/off, snappy/zstd/gzip/none
codecs, plus files written by our own byte-level pywriter) and checks
``fleet_page_audit`` row-for-row against DuckDB's ``parquet_metadata()``
over the same glob: chunk count, data-page value sum, and the
header-inclusive compressed/uncompressed byte sums must tile every file
exactly, whatever the writer did.

Also swept outside pytest by scripts/extra_seed_sweep.py (family
"fleet")."""

from __future__ import annotations

import os
import random

import pytest


def _make_fleet(tmp_path, seed: int, n_files: int = 104) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_parquet_parser_spark.sources.pywriter import (
        ColumnSpec,
        write_reference_bytes,
    )

    rng = random.Random(seed)
    fleet = tmp_path / f"fleet{seed}"
    fleet.mkdir()
    paths: list[str] = []
    for i in range(n_files):
        path = str(fleet / f"f_{i:04d}.parquet")
        n = rng.randrange(1, 400)
        if i % 10 == 3:
            # our own byte-level writer: PLAIN + dict pages, 1 KB splits
            ks = [rng.randrange(0, 1 << 31) for _ in range(n)]
            ss = [
                None if rng.random() < 0.1 else "v" * rng.randrange(0, 12)
                for _ in range(n)
            ]
            write_reference_bytes(
                path,
                [ColumnSpec("k", "int64"), ColumnSpec("s", "byte_array")],
                [ks, ss],
            )
        else:
            cols: dict = {"id": pa.array(range(n), pa.int64())}
            if rng.random() < 0.7:
                cols["val"] = pa.array(
                    [
                        None if rng.random() < 0.2 else rng.random()
                        for _ in range(n)
                    ],
                    pa.float64(),
                )
            if rng.random() < 0.7:
                # low cardinality → dictionary-encoded unless disabled
                cols["tag"] = pa.array(
                    [f"t{rng.randrange(0, 5)}" for _ in range(n)]
                )
            if rng.random() < 0.3:
                # nested: list<int64> — two leaf-bearing pages per level
                cols["xs"] = pa.array(
                    [
                        [rng.randrange(0, 9)] * rng.randrange(0, 4)
                        for _ in range(n)
                    ],
                    pa.list_(pa.int64()),
                )
            pq.write_table(
                pa.table(cols),
                path,
                row_group_size=rng.choice([16, 64, 256, None]),
                compression=rng.choice(["none", "snappy", "zstd", "gzip"]),
                use_dictionary=rng.random() < 0.8,
                data_page_size=rng.choice([512, 4096, None]),
            )
        paths.append(path)
    return paths


def _duck_audit(fleet_glob: str) -> dict[str, tuple]:
    import duckdb

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT file_name,
                   count(*),
                   sum(num_values),
                   sum(total_compressed_size),
                   sum(total_uncompressed_size)
            FROM parquet_metadata('{fleet_glob}')
            GROUP BY file_name
            """
        ).fetchall()
    finally:
        con.close()
    return {
        os.path.realpath(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for r in rows
    }


@pytest.mark.parametrize("seed", [7, 4242])
def test_fleet_audit_matches_parquet_metadata_on_many_files(
    spark, tmp_path, seed
):
    from duckdb_parquet_parser_spark.inspect import fleet_page_audit

    paths = _make_fleet(tmp_path, seed)
    assert len(paths) >= 100
    got = {
        os.path.realpath(r["file_name"]): (
            r["n_chunks"],
            r["num_values"],
            r["compressed_bytes"],
            r["uncompressed_bytes"],
        )
        for r in fleet_page_audit(spark, paths).collect()
    }
    want = _duck_audit(os.path.join(os.path.dirname(paths[0]), "*.parquet"))
    assert set(got) == set(want)
    bad = {p: (got[p], want[p]) for p in want if got[p] != want[p]}
    assert not bad, dict(list(bad.items())[:5])


def test_fleet_audit_distributes_the_walk(spark, tmp_path):
    """The 100 TB contract: the header walk must run ON EXECUTORS with
    one task per file (the repartition(len(paths)) in fleet_page_audit),
    and the only thing that moves is the O(files) stats frame — the plan
    is a scan of the tiny path list into one Arrow-batched python node,
    never a file-content scan."""
    from duckdb_parquet_parser_spark.inspect import fleet_page_audit
    from duckdb_parquet_parser_spark.plans import formatted_plan

    paths = _make_fleet(tmp_path, 99, n_files=24)
    df = fleet_page_audit(spark, paths)
    assert df.rdd.getNumPartitions() == len(paths)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan or "mapInPandas" in plan
    assert "FileScan" not in plan  # paths come from a local relation
