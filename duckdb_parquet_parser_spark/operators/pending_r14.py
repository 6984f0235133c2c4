"""PENDING queries staged for the round-15 window — built and
differentially tested since round 13, deliberately NOT registered in
``operators/__init__.py``. Round 14 registered this tranche's four TPC-H
completers (now ``operators/relational_q9.py``) because the r14 head was
over-subscribed (46 must-rotate r11 certs + 6 staged candidates for 50
slots); the two token-mix queries below floated one round exactly as the
COVERAGE.md "Round-14 window plan" prescribed — they are
composition-adjacent to the r15 tranche (the token-budget rule is
already exercised inside ``curate_epoch`` and by the
``per_source_token_keepers`` equivalence tests every round). Same
staging discipline that shipped ``pending_r13`` → ``curation.py``: the
differential runs every round via tests/test_pending_r14.py, so the
future registration is a rename, not new risk.

- ``ns_token_budget_mix`` — the per-source TOKEN-BUDGET greedy fill, the
  step after ``ns_source_cap`` in a real mixture pipeline: instead of
  capping by document COUNT, each provenance bucket is filled in quality
  order (the certified logit, doc_id tiebreak) until its cumulative
  token count exceeds ``SOURCE_TOKEN_BUDGET`` — the "best N tokens per
  domain, not best N docs" policy training-mix assembly actually wants
  (docs have wildly different lengths; a count cap over-weights verbose
  sources). A doc is kept iff the budget was not already exhausted
  BEFORE it (so the straddling doc is kept — the budget is a watermark,
  not a hard wall; both engines express this as ``cum - nt <
  budget``). Scale shape: ONE hash exchange on ``source`` drives both
  the rank and the running sum (same window partitioning); the per-row
  token count is a zero-shuffle projection; the skew answer is the same
  salted two-phase pre-prune as ``per_source_keepers`` (a row whose own
  salt bucket already exceeds the budget before it can never be kept).

- ``ns_weighted_token_mix`` (bottom) — the VERDICT r12 #8 composition:
  the ``ns_mixture_weights`` (lang, source) domain structure × the
  token-budget fill, each domain allocated the uniform share of a
  global token budget (broadcast-scalar domain count, never a driver
  collect) and filled in quality order.

Reference analog: none (reference has no relational/curation surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
# ONE assembled logit-SQL fragment (curation.py) — a drifting copy here
# would silently desynchronize the pending oracles' quality ordering
# from the registered gates (code review r13)
from .curation import _LOGIT_SQL
from .ngram_stats import q_ns_quality_logit

SOURCE_TOKEN_BUDGET = 600  # tokens per provenance bucket


def q_ns_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget greedy fill: quality-ordered running token
    sum per source; kept while the budget wasn't exhausted before the
    doc (watermark semantics — the straddling doc is kept)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    scored = q_ns_quality_logit(spark, sf_dir).select(
        "doc_id", "logit_micro"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(scored, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "logit_micro",
            cum.alias("cum_tokens"),
        )
        .withColumn(
            "kept",
            (F.col("cum_tokens") - F.col("n_tokens"))
            < F.lit(SOURCE_TOKEN_BUDGET),
        )
    )


# Q14 REGISTERED in round 15 (relational_q9.QUERIES_STAGED → QUERIES,
# the 50th head slot next to the 49 r12 rotations); the STAGED dicts it
# leaves behind are empty, so these imports merge nothing — they stay
# as the staging seam the next TPC-H-adjacent tranche reuses.
from .relational_q9 import ORACLES_STAGED as _Q14_ORACLES
from .relational_q9 import QUERIES_STAGED as _Q14_QUERIES

QUERIES_PENDING = {
    "ns_token_budget_mix": q_ns_token_budget_mix,
    **_Q14_QUERIES,
}

ORACLES_PENDING = {
    **_Q14_ORACLES,
    "ns_token_budget_mix": f"""
        WITH scored AS (
            SELECT doc_id, source,
                   CASE WHEN text IS NOT NULL
                        THEN len(string_split(text, ' ')) ELSE 0
                   END AS n_tokens,
                   CAST(CASE WHEN text IS NOT NULL
                             THEN {_LOGIT_SQL} ELSE NULL END
                        AS BIGINT) AS logit_micro
            FROM documents
        )
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               logit_micro,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY logit_micro DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens,
               (sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY logit_micro DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens) < {SOURCE_TOKEN_BUDGET} AS kept
        FROM scored WHERE logit_micro IS NOT NULL
    """,
}


TOKEN_MIX_SALTS = 32


def per_source_token_keepers(
    df: DataFrame, budget: int = SOURCE_TOKEN_BUDGET
) -> DataFrame:
    """Skew-safe KEPT-ONLY variant of the token-budget fill for 100 TB —
    the ``per_source_keepers`` discipline applied to a running SUM
    instead of a rank. Pruning argument: a row's global better-set (its
    source's rows with higher (logit, -doc_id)) is a SUPERSET of its own
    salt bucket's better-set, so its global starting offset
    ``cum - n_tokens`` is ≥ the bucket-local one — a row already past
    the watermark INSIDE its bucket is past it globally and can never be
    kept. Phase 1 keeps each bucket's watermark prefix (≤ budget tokens
    + one straddler per bucket); phase 2 re-runs the exact running sum
    over ≤ SALTS × (prefix) candidate rows per source. Dropping
    non-candidates cannot change the survivors' cumulative sums — every
    dropped row sits strictly AFTER the global watermark, and the sum
    only consumes rows before it (equivalence pinned in
    tests/test_pending_r14.py).

    Input: (doc_id, source, n_tokens, logit_micro); output: the keepers
    with their exact global ``cum_tokens``.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(TOKEN_MIX_SALTS))
    )
    w_local = Window.partitionBy("source", "_salt").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    local_cum = F.sum("n_tokens").over(
        w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cands = (
        salted.withColumn("_lc", local_cum)
        .filter((F.col("_lc") - F.col("n_tokens")) < budget)
        .drop("_salt", "_lc")
    )
    w_global = Window.partitionBy("source").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    cum = F.sum("n_tokens").over(
        w_global.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cands.withColumn("cum_tokens", cum)
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < budget)
    )


TOTAL_MIX_TOKENS = 20000  # global token budget to equalize across domains


def q_ns_weighted_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture-equalizing sampler VERDICT r12 #8 sketched: compose
    the ``ns_mixture_weights`` domain structure with the token-budget
    fill — each (lang, source) DOMAIN gets the uniform share of
    ``TOTAL_MIX_TOKENS`` (the DoReMi-style equalized allocation that
    ``ns_mixture_weights``' resampling weight targets), filled in
    quality order with watermark-keep semantics. Integer floor division
    for the per-domain budget on both sides.

    Plan: the domain count is a 1-row broadcast off a distinct aggregate
    (the Q11/Q22 broadcast-scalar discipline — never a driver collect);
    ONE hash exchange on (lang, source) drives the rank/running-sum
    window; the per-row token count and logit are zero-shuffle
    projections. Skew path: ``per_source_token_keepers``' salted
    pre-prune applies verbatim with the composite domain key."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    scored = q_ns_quality_logit(spark, sf_dir).select(
        "doc_id", "logit_micro"
    )
    base = docs.join(scored, "doc_id")
    n_domains = base.select("lang", "source").distinct().agg(
        F.count(F.lit(1)).alias("n_domains")
    )
    w = Window.partitionBy("lang", "source").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(n_domains))
        .withColumn(
            "domain_budget",
            F.expr(f"{TOTAL_MIX_TOKENS} div n_domains").cast("long"),
        )
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "domain_budget",
            cum.alias("cum_tokens"),
        )
        .withColumn(
            "kept",
            (F.col("cum_tokens") - F.col("n_tokens"))
            < F.col("domain_budget"),
        )
    )


QUERIES_PENDING["ns_weighted_token_mix"] = q_ns_weighted_token_mix

ORACLES_PENDING["ns_weighted_token_mix"] = f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               CASE WHEN text IS NOT NULL
                    THEN len(string_split(text, ' ')) ELSE 0
               END AS n_tokens,
               CAST(CASE WHEN text IS NOT NULL
                         THEN {{logit}} ELSE NULL END AS BIGINT)
                   AS logit_micro
        FROM documents
    ), base AS (
        SELECT * FROM scored WHERE logit_micro IS NOT NULL
    ), nd AS (
        SELECT count(*) AS n_domains
        FROM (SELECT DISTINCT lang, source FROM base)
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({TOTAL_MIX_TOKENS} // n_domains AS BIGINT)
               AS domain_budget,
           CAST(sum(n_tokens) OVER (
               PARTITION BY lang, source
               ORDER BY logit_micro DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           (sum(n_tokens) OVER (
               PARTITION BY lang, source
               ORDER BY logit_micro DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens) < ({TOTAL_MIX_TOKENS} // n_domains) AS kept
    FROM base, nd
""".replace("{logit}", _LOGIT_SQL)
