"""Non-parquet sources/sinks: CSV and JSON-lines round-trips.

The reference is parquet-only (its entire purpose is hand-decoding the
format); a Spark-native engine gets the other interchange formats for
free, and a training-data pipeline ingests all of them. Each query writes
the documents table through the format and reads it back with an explicit
schema — the oracle is the source table itself, so the check proves
lossless write+read (quoting, escaping, type round-trip).

Scale notes: both sinks shard per-task exactly like parquet; CSV/JSON
scans parallelize by file split. Schemas are always passed explicitly —
inference is a full extra pass at 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(*_COLS)


def csv_roundtrip(df: DataFrame, path: str) -> DataFrame:
    df.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)
    return df.sparkSession.read.schema(df.schema).option(
        "header", "true"
    ).option("escape", '"').csv(path)


def json_roundtrip(df: DataFrame, path: str) -> DataFrame:
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def q_src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.gettempdir(), "sg_src_csv")
    return csv_roundtrip(_docs(spark, sf_dir), out).select(*_COLS)


def q_src_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.gettempdir(), "sg_src_json")
    return json_roundtrip(_docs(spark, sf_dir), out).select(*_COLS)


QUERIES = {
    "src_csv_roundtrip": q_src_csv_roundtrip,
    "src_json_roundtrip": q_src_json_roundtrip,
}

_SRC_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"

ORACLES = {
    "src_csv_roundtrip": _SRC_SQL,
    "src_json_roundtrip": _SRC_SQL,
}
