"""Property fuzz of the CSV and JSON-lines round-trips (sources/formats.py):
arbitrary strings (commas, quotes, unicode, padding, empty-vs-null) plus
int/double/bool/null columns must survive write+read exactly. CSV excludes
newlines and the null sentinel (format limits documented on
``csv_roundtrip``); JSON gets the full alphabet including newlines."""

from __future__ import annotations

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

from duckdb_parquet_parser_spark.sources.formats import (
    _CSV_NULL,
    csv_roundtrip,
    json_roundtrip,
)
from duckdb_parquet_parser_spark.testing import canonical_hash

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("b", T.BooleanType(), True),
    ]
)

_chars = st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00")
_text_any = st.text(alphabet=_chars, max_size=30)
_text_csv = _text_any.filter(
    lambda s: "\n" not in s and "\r" not in s and s != _CSV_NULL
)


def _rows(text_strategy):
    return st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            st.one_of(st.none(), text_strategy),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
            st.one_of(st.none(), st.booleans()),
        ),
        max_size=40,
    )


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows(_text_csv))
def test_csv_roundtrip_lossless(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path_factory.mktemp("csvfuzz") / "t.csv")
    assert canonical_hash(csv_roundtrip(df, path).toPandas()) == canonical_hash(
        df.toPandas()
    )


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows(_text_any))
def test_json_roundtrip_lossless(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path_factory.mktemp("jsonfuzz") / "t.json")
    assert canonical_hash(json_roundtrip(df, path).toPandas()) == canonical_hash(
        df.toPandas()
    )


def test_csv_roundtrip_rejects_in_band_sentinel(spark, tmp_path_factory):
    """A value literally equal to the null sentinel cannot survive a CSV
    round trip (CSV nulls are in-band); the writer must refuse loudly
    instead of silently corrupting it into NULL on read (ADVICE r4)."""
    from duckdb_parquet_parser_spark.sources.formats import _CSV_NULL

    path = str(tmp_path_factory.mktemp("csv_sentinel") / "out")
    df = spark.createDataFrame(
        [(1, "ok"), (2, _CSV_NULL)], ["id", "text"]
    )
    with pytest.raises(ValueError, match="sentinel"):
        csv_roundtrip(df, path)
    # sentinel-free data with NULLs and empties still round-trips
    clean = spark.createDataFrame(
        [(1, "ok"), (2, None), (3, "")], ["id", "text"]
    )
    assert canonical_hash(csv_roundtrip(clean, path).toPandas()) == canonical_hash(
        clean.toPandas()
    )
