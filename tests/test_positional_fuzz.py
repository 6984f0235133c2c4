"""Property fuzz of the two-pass prefix-sum machinery (operators/
positional.py): for ANY row set and ANY physical partitioning, the
file-order positions must be a permutation of 0..n−1 and the running
total must equal the exclusive cumulative sum of the cost column taken in
position order — the invariant every consumer (chunk ids, byte offsets,
sequence packing) builds on. Randomized inputs with zero costs, nulls,
single rows, and 1/3/8-way repartitions exercise the partition-offset
bookkeeping that fixed fixtures cannot."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_parquet_parser_spark.operators.positional import (
    file_order_running_total,
    scalable_chunk_ids,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("cost", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _random_rows(seed: int, n: int):
    rng = random.Random(seed)
    return [
        (
            i,
            rng.choice([0, 0, 1, 3, 17, 256]),
            None
            if rng.random() < 0.15
            # multibyte characters included: chunk costs follow UTF-8
            # BYTES (the reference's std::string semantics), not chars
            else rng.choice(["x", "é", "漢", "𝄞"]) * rng.randrange(0, 40),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("n,parts", [(0, 1), (1, 3), (57, 1), (200, 3), (200, 8)])
def test_running_total_is_exclusive_cumsum_any_partitioning(
    spark, seed, n, parts
):
    df = spark.createDataFrame(_random_rows(seed, n), SCHEMA).repartition(parts)
    got = file_order_running_total(df, F.col("cost")).collect()
    assert sorted(r.pos for r in got) == list(range(n))
    run = 0
    for r in sorted(got, key=lambda r: r.pos):
        assert r.before == run, (r.pos, r.before, run)
        run += r.cost
    assert run == sum(r.cost for r in got)


@pytest.mark.parametrize("seed", [7, 8])
@pytest.mark.parametrize("parts", [1, 5])
def test_chunk_ids_follow_byte_prefix_sum(spark, seed, parts):
    rows = _random_rows(seed, 120)
    df = spark.createDataFrame(rows, SCHEMA).repartition(parts)
    got = scalable_chunk_ids(df, column="text", chunk_size=64).collect()
    # positions cover ALL rows; output keeps only non-null values
    n_nonnull = sum(1 for r in rows if r[2] is not None)
    assert len(got) == n_nonnull
    assert len({r.pos for r in got}) == n_nonnull
    # chunk assignment = floor(bytes-before / chunk_size) in pos order,
    # where null rows contribute 0 bytes but still occupy positions; the
    # per-value byte cost is the reference's append cost, digits(len)+len
    by_pos = {r.pos: r for r in got}
    running = 0
    for pos in range(120):
        r = by_pos.get(pos)
        if r is not None:
            assert r.chunk_id == running // 64, (pos, r.chunk_id, running)
            n = len(r.value.encode("utf-8"))
            running += len(str(n)) + n
    # chunk ids are non-decreasing in position order
    chunk_seq = [r.chunk_id for r in sorted(got, key=lambda r: r.pos)]
    assert chunk_seq == sorted(chunk_seq)
