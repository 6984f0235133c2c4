"""Property fuzz of the sessionizer's merge core (streaming/stateful.py
`_merge_event`): the operator's whole correctness argument is that
inserting events in ANY arrival order converges to the same session set
as sequential gap-sessionization over time-sorted events — that is what
makes the multi-microbatch streaming result equal the batch oracle. The
fuzz feeds random event sets (duplicate timestamps, exact-gap
boundaries, single events) in shuffled orders and checks every
permutation lands on the sequential reference answer. Pure Python — no
SparkSession needed."""

from __future__ import annotations

import random

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)


# SPARK_GRAFT_FUZZ_SCALE multiplies example counts for deep/overnight
# confidence runs; the default keeps the suite fast.
import os as _os
_N_EXAMPLES = 15 * int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

from duckdb_parquet_parser_spark.streaming.stateful import GAP_US, _merge_event

# timestamps on a lattice of GAP_US/4 steps so exact-gap boundaries
# (ts - last == GAP_US, the strict "new session" edge) occur often
_ts = st.integers(0, 40).map(lambda k: k * (GAP_US // 4))
_event = st.tuples(_ts, st.integers(-5_000_000, 5_000_000))  # (ts_us, val_us)


def _reference(events):
    """Sequential gap-sessionization over time-sorted events (the batch
    definition): a session breaks when the inter-event gap EXCEEDS GAP_US
    (inclusive at exactly gap — Spark session_window semantics)."""
    out = []
    for ts, val in sorted(events):
        if out and ts <= out[-1][1] + GAP_US:
            s = out[-1]
            s[1] = max(s[1], ts)
            s[2] += 1
            s[3] += val
        else:
            out.append([min(ts, ts), ts, 1, val])
        out[-1][0] = min(out[-1][0], ts)
    return sorted(tuple(s) for s in out)


@settings(max_examples=_N_EXAMPLES * 20, deadline=None)
@given(events=st.lists(_event, max_size=25), seed=st.integers(0, 2**32 - 1))
def test_merge_event_is_arrival_order_independent(events, seed):
    expected = _reference(events)
    order = list(events)
    random.Random(seed).shuffle(order)
    sessions: list[list[int]] = []
    for ts, val in order:
        _merge_event(sessions, ts, val)
    assert sorted(tuple(s) for s in sessions) == expected
