"""Differential testing of the STREAMING family on randomized events
fixtures (VERDICT r4 #6) — the streaming counterpart of
tests/test_randomized_events.py.

Each seed writes a random events table (coarse timestamp lattice →
frequent exact ties at window/watermark boundaries, skewed users, values
at the quantization edge), stages it through the real file-stream source
(`stage_events` → time-ranged files, mtime-ordered arrival), runs every
declared streaming query to completion, and compares against the BATCH
DuckDB oracle via the standard harness — the streaming-batch equivalence
contract under inputs the fixed fixture never produces.

The fixture rows avoid the one regime the declared queries deliberately
exclude: late data beyond the watermark (arrival is staged in event-time
order, so the 2-hour watermarks never drop an on-time file — same
guarantee the curated fixture provides)."""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

from duckdb_parquet_parser_spark.catalog import TABLES
from duckdb_parquet_parser_spark.testing import run_all

SF_BASE = "/root/testdata/sf0.001"

STREAMING_QUERIES = [
    "streaming_tumbling_rt",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_join",
]

_BASE_TS = dt.datetime(2024, 1, 1)


def _make_fixture(tmp_path, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = tmp_path / f"rands{seed}"
    sf_dir.mkdir()
    for t in TABLES:
        src = os.path.join(SF_BASE, f"{t}.parquet")
        if t != "events" and os.path.exists(src):
            os.symlink(src, sf_dir / f"{t}.parquet")
    n = 400
    # lattice includes the 30-minute join-window edge (1800 s) and exact
    # ties — the boundaries where stream-stream join and tumbling windows
    # could silently diverge from the batch oracle
    lattice = [0, 1, 59, 60, 1799, 1800, 1801, 3599, 3600, 5400]
    rows = []
    for i in range(n):
        user = rng.choice([1, 1, 1, 2, 3, 5, 8, 13])
        secs = rng.choice(lattice) + 3600 * rng.randrange(0, 24)
        ts = _BASE_TS + dt.timedelta(seconds=secs)
        etype = rng.choice(["view", "view", "purchase", "click", "refund"])
        value = rng.choice([0.0, -1.5, 2.718281, 0.0000005, 123.456789, 0.1])
        props = rng.choice(['{"k": 1}', "{}", '{"n": null}'])
        rows.append((i, ts, user, etype, value, props))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(table, sf_dir / "events.parquet")
    return str(sf_dir)


@pytest.mark.parametrize("seed", [301, 302])
def test_streaming_queries_match_batch_oracles_on_random_fixtures(
    spark, tmp_path, seed
):
    sf_dir = _make_fixture(tmp_path, seed)
    results = run_all(spark, sf_dir, only=STREAMING_QUERIES)
    bad = [str(r) for r in results if not r.ok]
    assert not bad, "\n".join(bad)
    assert len(results) == len(STREAMING_QUERIES)
