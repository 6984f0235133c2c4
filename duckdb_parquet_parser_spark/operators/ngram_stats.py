"""N-gram duplication profiling over the documents corpus — round-4
additions to the §2.5 LLM-pipeline family (the Gopher/MassiveText-style
repetition rules operate on exactly these signals; the reference repo has
no text operators at all, its README's regex chunk report is the closest
analog — README.md:54-65).

Certification note: declared this round, parked behind the driver's
50-query window (operators/__init__.py ROTATION_TAIL — the window is
full with the round-2 re-certification rotation); differential-tested
locally at sf0.001 via tests/test_oracle_parity.py, driver-certified
when the window rotates in round 5.

Scale notes (100 TB):
- `ns_dupgram_profile` is a pure per-row column expression (split →
  transform → array_distinct → arithmetic): zero shuffle, embarrassingly
  parallel, whole-stage-codegen'd end to end.
- `ns_shared_ngrams` explodes n-grams once and shuffles them exactly once
  on the gram for the distinct-doc count (two-phase distinct aggregate:
  map-side partial de-dup of (gram, doc) before the exchange); top-k is
  TakeOrderedAndProject, no global sort. At corpus scale the same plan is
  how suffix-style cross-doc duplication audits run — the shuffle volume
  is the distinct (gram, doc) pairs, already minimized map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

DUP_N = 3  # intra-doc duplication gram size (Gopher uses 2-4)
SHARED_N = 12  # cross-doc shared-run gram size (near-dup evidence)
SHARED_MIN_DOCS = 2
SHARED_TOP_K = 20


def _all_word_ngrams(ws, n: int):
    """ALL word n-grams of a split-text array (duplicates preserved — the
    duplication signal IS the duplicates; `text._word_ngrams` is the
    distinct variant)."""
    return F.filter(
        F.transform(
            ws,
            lambda w, i: F.when(
                i + n - 1 < F.size(ws),
                F.concat_ws(
                    " ", w, *[F.element_at(ws, i + k + 1) for k in range(1, n)]
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )


def q_ns_dupgram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-n-gram fraction: 1 − distinct/total over the
    doc's word 3-grams — the quality signal repetition filters threshold
    on. The fraction is a ratio of two exact integers, so the double
    division is bit-identical in both engines; no rounding needed."""
    df = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    grams = _all_word_ngrams(ws, DUP_N)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return df.filter(F.size(ws) >= DUP_N).select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        (
            F.lit(1.0) - n_distinct.cast("double") / n_grams.cast("double")
        ).alias("dup_frac"),
    )


def q_ns_shared_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared n-gram audit: the 12-grams appearing in ≥ 2
    distinct documents, top-20 by document count — the direct evidence a
    near-dup/boilerplate hunt starts from (a 12-word verbatim overlap is
    never chance at real vocabulary sizes)."""
    df = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    grams = df.select(
        "doc_id",
        F.explode(F.array_distinct(_all_word_ngrams(ws, SHARED_N))).alias(
            "gram"
        ),
    )
    return (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= SHARED_MIN_DOCS)
        .orderBy(F.col("n_docs").desc(), F.col("gram"))
        .limit(SHARED_TOP_K)
    )


QUERIES = {
    "ns_dupgram_profile": q_ns_dupgram_profile,
    "ns_shared_ngrams": q_ns_shared_ngrams,
}

ORACLES = {
    "ns_dupgram_profile": f"""
        WITH g AS (
            SELECT doc_id,
                   [array_to_string(words[i:i+{DUP_N - 1}], ' ')
                    FOR i IN range(1, len(words) - {DUP_N - 2})] AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents)
            WHERE len(words) >= {DUP_N}
        )
        SELECT doc_id,
               len(grams) AS n_grams,
               len(list_distinct(grams)) AS n_distinct,
               1.0 - len(list_distinct(grams))::DOUBLE / len(grams)::DOUBLE
                   AS dup_frac
        FROM g
    """,
    "ns_shared_ngrams": f"""
        WITH g AS (
            SELECT DISTINCT doc_id,
                   unnest([array_to_string(words[i:i+{SHARED_N - 1}], ' ')
                           FOR i IN range(1, len(words) - {SHARED_N - 2})])
                       AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents)
        )
        SELECT gram, count(DISTINCT doc_id) AS n_docs
        FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= {SHARED_MIN_DOCS}
        ORDER BY n_docs DESC, gram
        LIMIT {SHARED_TOP_K}
    """,
}
