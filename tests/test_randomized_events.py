"""Differential testing on RANDOMIZED events fixtures — the events-family
counterpart of tests/test_randomized_docs.py. Random timestamps with
deliberate exact ties (the window/session/as-of boundary cases), values
at quantization edges, and skewed users re-run the window, session,
as-of, range-frame, and scalar-function query/oracle pairs through the
standard harness. Tie and boundary semantics are exactly where a Spark
window and a DuckDB window could silently disagree; the fixed fixture
rarely produces them."""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

from duckdb_parquet_parser_spark.catalog import TABLES
from duckdb_parquet_parser_spark.testing import run_all

SF_BASE = "/root/testdata/sf0.001"

EVENT_QUERIES = [
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "rel_asof_join",
    "rel_range_join",
    "rel_window_range_time",
    "rel_case_expr",
    "rel_json_map_funcs",
    "ns_approx_distinct_hll",
]

_BASE_TS = dt.datetime(2024, 1, 1)


def _make_fixture(tmp_path, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = tmp_path / f"rande{seed}"
    sf_dir.mkdir()
    for t in TABLES:
        src = os.path.join(SF_BASE, f"{t}.parquet")
        if t != "events" and os.path.exists(src):
            os.symlink(src, sf_dir / f"{t}.parquet")
    n = 400
    # timestamps on a coarse lattice → frequent EXACT ties and
    # window-boundary hits (session gap, tumbling edges, as-of equality)
    lattice = [0, 1, 59, 60, 61, 299, 300, 301, 600, 1800, 1801, 3600]
    rows = []
    for i in range(n):
        user = rng.choice([1, 1, 1, 2, 3, 5, 8, 13])  # skewed users
        secs = rng.choice(lattice) + 3600 * rng.randrange(0, 48)
        ts = _BASE_TS + dt.timedelta(seconds=secs)
        etype = rng.choice(["view", "click", "purchase", "refund"])
        # values at the 6-decimal quantization edge and negatives
        value = rng.choice(
            [0.0, -1.5, 2.718281, 0.0000005, 123.456789, 1e6, 0.1]
        )
        props = rng.choice(
            ['{"k": 1}', '{"k": 2, "tag": "a b"}', "{}", '{"n": null}']
        )
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


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_event_queries_match_oracles_on_random_fixtures(spark, tmp_path, seed):
    sf_dir = _make_fixture(tmp_path, seed)
    results = run_all(spark, sf_dir, only=EVENT_QUERIES)
    bad = [str(r) for r in results if not r.ok]
    assert not bad, "\n".join(bad)
    assert len(results) == len(EVENT_QUERIES)
