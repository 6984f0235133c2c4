"""Property-based round-trip fuzz of the reference-style writer (W1):
for arbitrary rows (int64 extremes, ±inf/NaN doubles, unicode strings,
null-riddled bools, microsecond timestamps), the file written with the
reference's physical knobs (1 KB pages, dictionary on, uncompressed —
sources/writer.py) must read back value-identical in BOTH consuming
engines this repo certifies against: Spark's vectorized reader and
DuckDB. This is the generative counterpart of the fixed `w1_roundtrip`
query — the writer claims are round-trip-verified, so the round trip
itself gets fuzzed.
"""

from __future__ import annotations

import datetime as dt

import duckdb
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

from duckdb_parquet_parser_spark.sources.writer import write_reference_style
from duckdb_parquet_parser_spark.testing import canonical_hash

SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType(), True),
        T.StructField("f", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("b", T.BooleanType(), True),
        T.StructField("t", T.TimestampNTZType(), True),
    ]
)

# Printable unicode without NUL/surrogates (cross-engine string identity).
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=40,
)

_row = st.tuples(
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
    ),
    st.one_of(st.none(), _text),
    st.one_of(st.none(), st.booleans()),
    st.one_of(
        st.none(),
        st.datetimes(
            min_value=dt.datetime(1900, 1, 1),
            max_value=dt.datetime(2199, 12, 31),
        ),
    ),
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, max_size=60))
def test_reference_style_write_reads_back_identically(
    spark, tmp_path_factory, rows
):
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path_factory.mktemp("wfuzz") / "t.parquet")
    write_reference_style(df, path)

    want = canonical_hash(df.toPandas())
    got_spark = canonical_hash(spark.read.parquet(path).toPandas())
    assert got_spark == want

    got_duck = canonical_hash(
        duckdb.connect()
        .execute(f"SELECT i, f, s, b, t FROM read_parquet('{path}/*.parquet')")
        .df()
    )
    assert got_duck == want
