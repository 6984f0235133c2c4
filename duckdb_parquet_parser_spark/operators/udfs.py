"""User-defined function surface — SURVEY.md §2.4 (UDF/UDAF/UDTF row).

The reference's only extension point is a C++ read-range callback
(column_reader.hpp:10); the Spark-native equivalents are demonstrated here
one per kind, each Arrow-batched and oracle-checked:

- scalar **pandas UDF** (vectorized, Arrow transfer — the 10-100× path
  over row-at-a-time Python);
- grouped-aggregate **pandas UDF** (a custom UDAF);
- Python **UDTF** (table function, one→many rows).

Engine-wide rule stands: UDFs are for semantics built-ins can't express;
everything here has a built-in equivalent on purpose so the oracle can
check the mechanism itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table

# Note: decorators take DataType objects, not DDL strings — string types
# are parsed through the active SparkContext, which doesn't exist yet at
# import time (collect_queries() imports this module before any session).


@pandas_udf(T.LongType())
def vowel_count(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized regex count over an Arrow batch."""
    return text.str.count("[aeiou]").astype("int64")


@pandas_udf(T.DoubleType())
def mean_chars(n_chars: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): exact integer sum then one double
    division — associative, so partial aggregation order can't change the
    result (same determinism rule as the engine's decimal sums)."""
    return float(n_chars.sum()) / len(n_chars)


@pandas_udf(T.LongType())
def count_rows(n_chars: pd.Series) -> int:
    """Companion UDAF — Spark disallows mixing group-agg pandas UDFs with
    built-in aggregates in one agg(), so the count is a pandas UDF too."""
    return len(n_chars)


@udtf(
    returnType=T.StructType(
        [
            T.StructField("idx", T.IntegerType()),
            T.StructField("word", T.StringType()),
        ]
    ),
    # resolved at decoration time (no session exists yet), so the Arrow
    # batching must be explicit — session conf alone cannot reach it
    useArrow=True,
)
class ExplodeWords:
    """Python UDTF: one row in → one row per token out (the table-function
    shape used for tokenizers/chunkers that emit variable row counts)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            yield i, w


def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", vowel_count("text").alias("n_vowels"))


def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.groupBy("lang").agg(
        mean_chars("n_chars").alias("mean_chars"),
        count_rows("n_chars").alias("n_docs"),
    )


def q_udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    # Arrow-batch the UDTF regardless of the caller's session defaults
    # (values are identical either way; the plan becomes ArrowEvalPythonUDTF
    # instead of row-at-a-time BatchEvalPython).
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("explode_words", ExplodeWords)
    df.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.idx, w.word
        FROM _udtf_docs d, LATERAL explode_words(d.text) AS w
        """
    )


QUERIES = {
    "udf_scalar_pandas": q_udf_scalar_pandas,
    "udf_grouped_agg": q_udf_grouped_agg,
    "udf_table_function": q_udf_table_function,
}

ORACLES = {
    "udf_scalar_pandas": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
                   AS n_vowels
        FROM documents
    """,
    "udf_grouped_agg": """
        SELECT lang,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
               count(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "udf_table_function": """
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                   AS INT) AS idx,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    """,
}
