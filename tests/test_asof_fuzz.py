"""Property fuzz of the custom as-of join (operators/asof.py) against
pandas ``merge_asof`` — the widely-trusted reference implementation of
backward as-of semantics. Random key collisions, left/right timestamp
ties (``l.ts == r.ts`` must match — backward as-of is inclusive), keys
with no right rows, and NULL payload fields all come out of the
generator. Right rows are unique per (key, ts): multiple right rows at
the same instant have no defined winner in any engine.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import types as T


# SPARK_GRAFT_FUZZ_SCALE multiplies example counts for deep/overnight
# confidence runs; the default keeps the suite fast.
import os as _os
_N_EXAMPLES = 15 * int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

from duckdb_parquet_parser_spark.operators.asof import asof_join_backward

_EPOCH = dt.datetime(2024, 1, 1)

_key = st.integers(0, 5)  # tiny domain → frequent key collisions
_ts = st.integers(0, 50).map(lambda s: _EPOCH + dt.timedelta(seconds=s))

_left_rows = st.lists(st.tuples(_key, _ts), max_size=30)
_right_rows = st.lists(
    st.tuples(_key, _ts, st.one_of(st.none(), st.integers(-1000, 1000))),
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("lts", T.TimestampNTZType(), False),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("rts", T.TimestampNTZType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def _expected(lrows, rrows) -> list[tuple]:
    lpd = (
        pd.DataFrame(lrows, columns=["k", "lts"])
        .astype({"k": "int64", "lts": "datetime64[us]"})
        .sort_values(["lts", "k"], kind="stable")
    )
    rpd = (
        pd.DataFrame(rrows, columns=["k", "rts", "v"])
        .astype({"k": "int64", "rts": "datetime64[us]", "v": "Int64"})
        .sort_values(["rts", "k"], kind="stable")
    )
    if lpd.empty or rpd.empty:
        return []  # inner as-of: nothing can match
    merged = pd.merge_asof(
        lpd,
        rpd.rename(columns={"rts": "lts"}),
        on="lts",
        by="k",
        direction="backward",
    )
    out = []
    for t in merged.itertuples(index=False):
        matched = not pd.isna(t.v) or _right_has_match(rrows, t.k, t.lts)
        if matched:
            out.append((t.k, t.lts, None if pd.isna(t.v) else int(t.v)))
    return sorted(out, key=lambda x: (x[0], x[1], x[2] is None, x[2] or 0))


def _right_has_match(rrows, k, lts) -> bool:
    # merge_asof reports NaN both for "no match" and "matched a NULL
    # payload"; disambiguate by checking for an actual matching right row
    return any(rk == k and rts <= lts for rk, rts, _ in rrows)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=_left_rows, rrows=_right_rows)
def test_asof_backward_matches_pandas(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    got = asof_join_backward(
        left, right, on="k", left_ts="lts", right_ts="rts", right_payload=["v"]
    ).collect()
    got_rows = sorted(
        ((r.k, r.lts, r.asof_v) for r in got),
        key=lambda x: (x[0], x[1], x[2] is None, x[2] or 0),
    )
    assert got_rows == _expected(lrows, rrows)
