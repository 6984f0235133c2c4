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

from ..catalog import load_table, scale_out

DUP_N = 3  # intra-doc duplication gram size (Gopher uses 2-4)
SHARED_N = 12  # cross-doc shared-run gram size (near-dup evidence)
SHARED_MIN_DOCS = 2
SHARED_TOP_K = 20


def _all_word_ngrams(ws, n: int):
    """ALL word n-grams of a split-text array (duplicates preserved — the
    duplication signal IS the duplicates; `text._word_ngrams` is the
    distinct variant).

    Built as ``array_join(slice(ws, i+1, n), ' ')`` per position rather
    than chaining n−1 ``element_at`` lookups into ``concat_ws``: one
    slice + one join is a single pass over the window, while the chain
    costs n−1 interpreted array probes PER POSITION — measured 4.3×
    slower at n=12 (10.8 s vs 2.5 s map-side over sf0.1; BENCH_NOTES r5).
    Identical output: ``split`` arrays contain no nulls, so concat_ws's
    null-skip never fired and both spellings emit the same space-joined
    window; the trailing ``when`` guard keeps only full windows."""
    return F.filter(
        F.transform(
            ws,
            lambda w, i: F.when(
                i + n - 1 < F.size(ws),
                F.array_join(F.slice(ws, i + 1, n), " "),
            ),
        ),
        lambda x: x.isNotNull(),
    )


def q_ns_dupgram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-n-gram fraction: 1 − distinct/total over the
    doc's word 3-grams — the quality signal repetition filters threshold
    on. The fraction is a ratio of two exact integers, so the double
    division is bit-identical in both engines; no rounding needed.

    ``scale_out`` spreads the single-split fixture scan before the
    per-row n-gram expressions — without it the whole HOF stage
    serializes on one core (flat 3.2 s from 4→32 cores in the round-5
    strong-scaling sweep, the same finding as ns_contamination in round
    4); a real corpus scan already arrives in thousands of splits, where
    the spread is a deliberate no-op."""
    df = scale_out(spark, load_table(spark, sf_dir, "documents"))
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
    never chance at real vocabulary sizes). ``scale_out`` spreads the
    single-split fixture scan below the gram generation (see
    q_ns_dupgram_profile — flat 5.5 s across core counts without it)."""
    df = scale_out(spark, load_table(spark, sf_dir, "documents"))
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


def q_ns_common_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative commonness score: per document, the mean document
    frequency of its DISTINCT tokens — the CCNet/Gopher-family signal
    separating boilerplate-ish docs (tokens everywhere) from topical ones
    (rare tokens), computed without any model. The ratio is exact-int
    division to double, identical both engines.

    Scale shape: one distinct (doc, token) explode → one token-keyed
    aggregation for the document-frequency table → one token-keyed join
    back → one doc-keyed aggregation. The df table is vocab-sized (Heaps'
    law: ≪ corpus), the join is a shuffle equi-join AQE can skew-split;
    nothing is quadratic."""
    df = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("df_sum"),
        )
        .select(
            "doc_id",
            "n_distinct",
            "df_sum",
            (
                F.col("df_sum").cast("double")
                / F.col("n_distinct").cast("double")
            ).alias("mean_df"),
        )
    )


# Fixed-weight linear quality model (micro-units per feature): the
# classifier-based-filtering plumbing with a deterministic stand-in for
# trained weights — the plan shape (per-row features → dot with a
# constant weight vector → threshold) is exactly what a real logistic
# gate runs; only the weights would change.
LOGIT_W_TOKENS = 120
LOGIT_W_DISTINCT = 480
LOGIT_W_CHARS = 7
LOGIT_BIAS = -60_000
LOGIT_KEEP_THRESHOLD = 0

# THE quality-logit DuckDB expression — the single source (consolidated
# r16; REVIEW_r14 #3 / VERDICT r15 #5). Until r16 this was spelled three
# times (here, curation._LOGIT_SQL, dedup's canonical-selection oracle)
# and only a tripwire test kept the copies in sync; now every certified
# oracle interpolates this fragment, so a weight or feature change can
# never desynchronize quality ordering across queries. The embedded
# newlines/indentation reproduce the historical oracle text byte-for-byte
# (pinned in tests/test_logit_sql_consistency.py) — the r15-certified
# ns_quality_logit oracle string is unchanged by the consolidation.
LOGIT_SQL = f"""{LOGIT_BIAS}
                    + len(string_split(text, ' ')) * {LOGIT_W_TOKENS}
                    + len(list_distinct(string_split(text, ' ')))
                      * {LOGIT_W_DISTINCT}
                    + length(text) * {LOGIT_W_CHARS}"""


def q_ns_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-style quality gate: integer linear score over token/char
    features + threshold keep flag. All-integer arithmetic → bit-identical
    across engines; zero shuffle (pure per-row projection)."""
    df = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ws = F.split("text", " ")
    logit = (
        F.lit(LOGIT_BIAS).cast("long")
        + F.size(ws).cast("long") * LOGIT_W_TOKENS
        + F.size(F.array_distinct(ws)).cast("long") * LOGIT_W_DISTINCT
        + F.length("text").cast("long") * LOGIT_W_CHARS
    )
    return df.select(
        "doc_id",
        logit.alias("logit_micro"),
        (logit >= LOGIT_KEEP_THRESHOLD).alias("keep"),
    )


QUERIES = {
    "ns_dupgram_profile": q_ns_dupgram_profile,
    "ns_shared_ngrams": q_ns_shared_ngrams,
    "ns_common_token_ratio": q_ns_common_token_ratio,
    "ns_quality_logit": q_ns_quality_logit,
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
    "ns_common_token_ratio": """
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        dfreq AS (
            SELECT tok, count(*) AS df FROM toks GROUP BY tok
        )
        SELECT t.doc_id,
               count(*) AS n_distinct,
               CAST(sum(d.df) AS BIGINT) AS df_sum,
               CAST(sum(d.df) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mean_df
        FROM toks t JOIN dfreq d ON d.tok = t.tok
        GROUP BY t.doc_id
    """,
    "ns_quality_logit": f"""
        SELECT doc_id,
               CAST({LOGIT_SQL} AS BIGINT)
                   AS logit_micro,
               ({LOGIT_SQL}) >= {LOGIT_KEEP_THRESHOLD}
                   AS keep
        FROM documents WHERE text IS NOT NULL
    """,
}
