"""Regex filtering — reference op F1 (README-only: README.md:54-65).

The reference CLI scans one column's data pages and reports pages with no
value matching a regex (`--regex-column C --regex P`, `--neg-regex` for the
inverse) — i.e. page-granular NOT-LIKE pruning. Spark-first mapping:

- Row-level semantics: ``df.filter(col.rlike(p))`` — Catalyst keeps the
  scan pruned to the filtered column; min/max/dict/bloom pushdown already
  covers the *physical* skipping the reference approximates by hand.
- The page-level *report* is emulated as chunk-level aggregation over the
  same synthetic chunk ids the X1 index uses (FIXTURES.md rule 4), which a
  SQL oracle can replicate exactly.

Patterns stay in the RE2 ∩ java.util.regex common subset so Spark
``rlike`` and DuckDB ``regexp_matches`` agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .positional import COST_SQL, scalable_chunk_ids

FLAG_PATTERN = "^[AR]$"
DOC_PATTERN = "merge (join|scan)"


def regex_filter(df: DataFrame, column: str, pattern: str, negate: bool = False) -> DataFrame:
    """F1 row-level filter; negate ⇒ the reference's --neg-regex."""
    cond = F.col(column).rlike(pattern)
    return df.filter(~cond if negate else cond)


def q_f1_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    return (
        regex_filter(df, "l_returnflag", FLAG_PATTERN)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f1_regex_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return regex_filter(df, "text", DOC_PATTERN).select("doc_id")


def q_f1_neg_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return regex_filter(df, "text", DOC_PATTERN, negate=True).agg(
        F.count(F.lit(1)).alias("n_non_matching")
    )


def q_f1_page_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages (≈4 KB chunks, FIXTURES.md rule 3/4) with NO value matching the
    pattern — the reference CLI's skippable-page report."""
    df = load_table(spark, sf_dir, "documents")
    chunked = scalable_chunk_ids(df)
    return (
        chunked.groupBy("chunk_id")
        .agg(
            F.sum(F.col("value").rlike(DOC_PATTERN).cast("long")).alias("n_match"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .filter(F.col("n_match") == 0)
        .select("chunk_id", "n_values")
    )


QUERIES = {
    "f1_regex_filter": q_f1_regex_filter,
    "f1_regex_docs": q_f1_regex_docs,
    "f1_neg_regex": q_f1_neg_regex,
    "f1_page_report": q_f1_page_report,
}

_CHUNK_CTE = f"""
    WITH pos AS (
        SELECT text, row_number() OVER (ORDER BY doc_id) - 1 AS pos
        FROM documents WHERE text IS NOT NULL
    ), chunked AS (
        SELECT text,
               CAST(floor((sum({COST_SQL}) OVER (ORDER BY pos)
                           - {COST_SQL}) / 4096) AS BIGINT) AS chunk_id
        FROM pos
    )
"""

ORACLES = {
    "f1_regex_filter": f"""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE regexp_matches(l_returnflag, '{FLAG_PATTERN}')
        GROUP BY l_returnflag
    """,
    "f1_regex_docs": f"""
        SELECT doc_id FROM documents
        WHERE regexp_matches(text, '{DOC_PATTERN}')
    """,
    "f1_neg_regex": f"""
        SELECT count(*) AS n_non_matching FROM documents
        WHERE NOT regexp_matches(text, '{DOC_PATTERN}')
    """,
    "f1_page_report": _CHUNK_CTE
    + f"""
        SELECT chunk_id, count(*) AS n_values
        FROM chunked
        GROUP BY chunk_id
        HAVING sum(CASE WHEN regexp_matches(text, '{DOC_PATTERN}') THEN 1 ELSE 0 END) = 0
    """,
}
