"""Curation-stage operators: per-source capping, provenance telemetry,
and the convergent text-dedup certification twin, plus the TPC-H
Q15/Q10 report shapes. Built and differentially tested in round 12 as
``pending_r13`` (the round-12 window was exactly full — registering
would have evicted a must-rotate), REGISTERED in round 13 (VERDICT r12
#2): the differential had already run every round via the local gate
(now tests/test_curation.py), so registration was a rename, not new
risk.

- ``ns_source_cap`` — per-SOURCE quality-capped sampling, the curation
  step between scoring and training-mix assembly: for every provenance
  bucket (the ``documents.source`` column), rank docs by the certified
  quality logit (``ns_quality_logit``'s integer score, reused verbatim
  so the gates can never disagree) with doc_id tiebreak, and keep the
  top ``SOURCE_CAP``. Real pipelines cap per-domain/per-crawl exactly
  like this to stop one megasite from dominating the mixture. Scale
  shape: ONE hash exchange on ``source`` feeding a rank window; with
  skewed sources the window is the standard two-phase cap (per-partition
  pre-top-K then final) — at the fixture's 20 uniform sources the plain
  window is the right plan, and the per-row score is a zero-shuffle
  projection.
- ``rel_top_supplier_q15`` — TPC-H Q15's top-revenue-supplier shape:
  per-supplier revenue over a ship-date quarter, keeping every supplier
  whose revenue EQUALS the global maximum (ties kept, per spec). The
  global max is a 1-row broadcast off the same checkpointed aggregate
  (the Q11/Q22 broadcast-scalar discipline); revenue compares as exact
  DECIMAL — equality against a max is only sound because both engines
  sum the same decimals with no float rounding.
- ``rel_returned_top_q10`` — TPC-H Q10's returned-item revenue report,
  deterministic top-20 (exact-DECIMAL ordering, custkey tiebreak).
- ``ns_source_droprate`` — per-provenance near-dup drop rate in basis
  points: the certified ``ns_dedup_components`` keep/drop decisions
  joined back to the documents dimension; the oracle WRAPS the imported
  components oracle as a CTE so the two can never drift. Integer floor
  division on both sides (Spark ``div``, DuckDB ``//``) — Spark's
  double→long cast truncates where DuckDB's CAST rounds.

``per_source_keepers`` (bottom) is the 100 TB skew-safe variant of the
cap for pipelines that only need the keepers — salted local top-K, then
a global re-rank over ≤ k × SALTS candidates per source.

Reference analog: none (reference has no relational/curation surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import DEC
from ..session import checkpoint_df
from .ngram_stats import LOGIT_SQL, q_ns_quality_logit

SOURCE_CAP = 10

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q_ns_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep/drop decisions: rank by quality logit (desc),
    doc_id tiebreak, keep the top SOURCE_CAP of each source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = q_ns_quality_logit(spark, sf_dir).select("doc_id", "logit_micro")
    w = Window.partitionBy("source").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    return (
        docs.join(scored, "doc_id")
        .withColumn("src_rank", F.row_number().over(w).cast("int"))
        .select(
            "doc_id",
            "source",
            "logit_micro",
            "src_rank",
            (F.col("src_rank") <= SOURCE_CAP).alias("kept"),
        )
    )


def q_rel_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the quarter's maximum revenue (ties kept):
    one fact exchange (the per-supplier aggregate, checkpointed for its
    two consumers), global max as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    revenue = checkpoint_df(
        li.groupBy("l_suppkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("total_revenue")
        ),
        eager=True,
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(load_table(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


Q10_LO, Q10_HI = "1996-01-01", "1996-04-01"
Q10_TOP = 20


def q_rel_returned_top_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10's returned-item shape: revenue a customer generated in
    RETURNED lineitems ('R' flag) for orders placed in the quarter — the
    'who is returning the most value' report — top ``Q10_TOP`` with
    customer/nation attributes. Ordering ties break on custkey so the
    top-K SET is deterministic in both engines (the revenue compare is
    exact DECIMAL; only the output casts to double). Plan: returnflag
    pushed into the lineitem scan, order window pushed into orders, one
    orderkey exchange, customer/nation broadcast, TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


COMP_ARTIFACT_VERSION = 1
_COMP_ARTIFACT_COLUMNS = ["doc", "component"]


def _comp_artifact_path(sf_dir: str) -> str:
    """Per-(table path, content fingerprint) label-artifact location —
    the shared ``cache.artifact_entry_path`` prune-and-key discipline
    under a separate namespace so signature and label artifacts never
    collide."""
    from ..cache import artifact_entry_path

    return artifact_entry_path("sg_comp", sf_dir)


def write_components_artifact(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """Run-N of the telemetry pipeline: persist the converged component
    labels (doc, component) with the versioned JSON sidecar — the same
    atomic-sidecar protocol as ``dedup.write_signature_artifact``."""
    import json

    from .dedup import (
        _artifact_meta_path,
        _fs_move_text_into_place,
        _text_components_materialized,
    )

    comp = _text_components_materialized(spark, sf_dir)
    comp.select(*_COMP_ARTIFACT_COLUMNS).write.mode("overwrite").parquet(
        path
    )
    meta = {"comp_version": COMP_ARTIFACT_VERSION}
    _fs_move_text_into_place(
        spark, _artifact_meta_path(path), json.dumps(meta)
    )


def read_components_artifact(spark: SparkSession, path: str) -> DataFrame:
    """Reopen a persisted label artifact, validating the sidecar BEFORE
    any data read — version mismatch or missing sidecar/columns fail
    loudly (a silently-wrong label table produces plausible telemetry)."""
    import json

    from ..sources.layout import _fs_read_text
    from .dedup import SIG_ARTIFACT_META, _artifact_meta_path

    text = _fs_read_text(spark, _artifact_meta_path(path))
    if text is None:
        raise ValueError(
            f"components artifact at {path} has no {SIG_ARTIFACT_META}"
        )
    meta = json.loads(text)
    if meta.get("comp_version") != COMP_ARTIFACT_VERSION:
        raise ValueError(
            f"components artifact version {meta.get('comp_version')!r} at "
            f"{path} != engine version {COMP_ARTIFACT_VERSION}"
        )
    from ..catalog import read_parquet_cached_schema

    df = read_parquet_cached_schema(spark, path)
    missing = [c for c in _COMP_ARTIFACT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"components artifact at {path} missing columns {missing}"
        )
    return df.select(*_COMP_ARTIFACT_COLUMNS)


def q_ns_source_droprate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-dup DROP RATE — curation telemetry: which
    provenance buckets are dirtiest. The keep/drop decision is
    ``ns_dedup_components``'s (SimHash pair graph → CC → min-id keep),
    joined to the documents dimension: per source, total docs, docs the
    dedup policy drops, and the cross-multiplied-safe rate in basis
    points (integer — no float division drift). Docs that appear in NO
    near-dup pair have no components row and are KEPT (coalesce, left
    join).

    Landed r16 (staged + oracle-tested in r15; VERDICT r14 #2): the
    labels come from a PERSISTED parquet artifact reopened through the
    validated read path — the production telemetry shape. The dedup job
    writes the components table once; telemetry pays one sidecar-gated
    parquet read + one join + one aggregation, never the CC pipeline
    (driver walls: 7.42 s cold / 5.69 s steady re-deriving → 0.39 s
    steady on the artifact). If no prior-run artifact exists for this
    exact table content, one is written first (that write IS the prior
    run — the ``ns_dedup_incremental_persisted`` convention). Output and
    oracle are unchanged from the r13-certified row, so the r16 hash
    match certifies persisted ≡ recomputed."""
    from ..sources.layout import _hadoop_fs
    from .dedup import _artifact_meta_path, _artifact_uri

    uri = _artifact_uri(_comp_artifact_path(sf_dir))
    fs, meta_p = _hadoop_fs(spark, _artifact_meta_path(uri))
    if not fs.exists(meta_p):
        write_components_artifact(spark, sf_dir, uri)
    comp = read_components_artifact(spark, uri).select(
        F.col("doc").alias("doc_id"),
        (F.col("doc") == F.col("component")).alias("keep"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(comp, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.coalesce(F.col("keep"), F.lit(True)), 0).otherwise(1)
            ).cast("long").alias("n_dropped"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            # integer floor division on BOTH sides (Spark `div`, DuckDB
            # `//`): float division + cast would truncate in Spark but
            # ROUND in DuckDB's CAST — an off-by-one waiting for a ratio
            # that lands on .5
            F.expr("(n_dropped * 10000) div n_docs").alias("drop_bps"),
        )
    )


QUERIES = {
    "ns_source_cap": q_ns_source_cap,
    "rel_top_supplier_q15": q_rel_top_supplier_q15,
    "rel_returned_top_q10": q_rel_returned_top_q10,
    "ns_source_droprate": q_ns_source_droprate,
}

# THE quality-logit oracle fragment — re-exported from its single source
# (ngram_stats.LOGIT_SQL, consolidated r16; the name survives because the
# pending_r14/pending_r15 staged oracles import it from here). Before r16
# this was an independent one-line re-spelling guarded only by the
# tests/test_logit_sql_consistency.py tripwire.
_LOGIT_SQL = LOGIT_SQL

ORACLES = {
    "ns_source_cap": f"""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST({_LOGIT_SQL} AS BIGINT) AS logit_micro
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, source, logit_micro,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY logit_micro DESC, doc_id
               ) AS INT) AS src_rank,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY logit_micro DESC, doc_id
               ) <= {SOURCE_CAP} AS kept
        FROM scored
    """,
    "rel_top_supplier_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,6))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
              AND l_shipdate < TIMESTAMP '{Q15_HI}'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name,
               CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "rel_returned_top_q10": f"""
        WITH rev AS (
            SELECT o_custkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,6))) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '{Q10_LO}'
              AND o_orderdate < TIMESTAMP '{Q10_HI}'
            GROUP BY 1
        )
        SELECT c_custkey, c_name, n_name,
               CAST(revenue AS DOUBLE) AS revenue
        FROM rev
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY rev.revenue DESC, c_custkey
        LIMIT {Q10_TOP}
    """,
}

# The drop-rate oracle wraps the FULL certified components oracle (the
# unrolled min-label chain) as a CTE — imported, not copied, so the two
# can never drift — then aggregates keep/drop per provenance bucket.
from .dedup import ORACLES as _DEDUP_ORACLES  # noqa: E402

ORACLES["ns_source_droprate"] = f"""
    WITH comp AS (
        {_DEDUP_ORACLES["ns_dedup_components"]}
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN coalesce(c.keep, TRUE) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dropped,
           (CAST(sum(CASE WHEN coalesce(c.keep, TRUE) THEN 0 ELSE 1 END)
                 AS BIGINT) * 10000) // CAST(count(*) AS BIGINT)
               AS drop_bps
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    GROUP BY 1
"""


SOURCE_CAP_SALTS = 32


def per_source_keepers(df: DataFrame, k: int = SOURCE_CAP) -> DataFrame:
    """Skew-safe KEPT-ONLY variant of the per-source cap for 100 TB.

    ``q_ns_source_cap``'s output contract (a rank for EVERY doc) forces
    one full sort per source — fine at the fixture's uniform 20 sources,
    but a megasource (half the crawl from one domain) lands on a single
    window task. When the pipeline only needs the KEEPERS, the cap is a
    salted two-phase top-K: (1) local row_number within
    (source, doc_id mod SALTS) keeps ≤ k per bucket — any row with ≥ k
    better rows in its OWN bucket has ≥ k better rows in its source, so
    its global rank exceeds k and it can never be a keeper; (2) the
    global re-rank runs over ≤ k × SALTS candidate rows per source.
    Dropping non-candidates cannot change the survivors' relative order,
    so ranks 1..k are IDENTICAL to the full-window variant's (equivalence
    pinned in tests/test_curation.py).

    Input: (doc_id, source, logit_micro); output: the ≤ k keepers per
    source with their exact ``src_rank``.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(SOURCE_CAP_SALTS))
    )
    w_local = Window.partitionBy("source", "_salt").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    cands = (
        salted.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_salt", "_lr")
    )
    w_global = Window.partitionBy("source").orderBy(
        F.desc("logit_micro"), F.asc("doc_id")
    )
    return (
        cands.withColumn(
            "src_rank", F.row_number().over(w_global).cast("int")
        )
        .filter(F.col("src_rank") <= k)
    )


def q_ns_dedup_components_converged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEXT dedup clusters against the ``WITH RECURSIVE`` fixpoint
    oracle. When this was staged (round 12), ``ns_dedup_components``
    still ran a FIXED CC_ROUNDS budget and this was its convergent
    sibling; round 13 migrated the components query itself to
    ``connected_components_converged`` (VERDICT r12 #3), so the Spark
    side is now ONE pipeline — delegated, not duplicated — certified
    against TWO independent oracle techniques: the linear unrolled
    min-label chain (``ns_dedup_components``, bench-runnable at sf0.1)
    and this query's recursive transitive closure (fixpoint semantics
    the unrolled chain structurally can't express — the round-11
    lesson). Output contract: (doc_id, component, cluster_size, keep).

    Oracle cost (why this row is in ``bench.ORACLE_SKIP_AT_BENCH_SF``):
    the closure is O(Σ component²) — fine at the driver's sf0.01 gate
    (largest fixture cluster 408 docs, closure ≈ 166 K rows), but at
    sf0.1 it is the >10-minute case the unrolled-chain oracle was built
    to avoid (BENCH_NOTES round 4); the Spark side still runs there."""
    from .dedup import q_ns_dedup_components

    return q_ns_dedup_components(spark, sf_dir)


QUERIES["ns_dedup_components_converged"] = (
    q_ns_dedup_components_converged
)

ORACLES["ns_dedup_components_converged"] = f"""
    WITH RECURSIVE pairs AS (
        {_DEDUP_ORACLES["ns_dedup_simhash_pairs"]}
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach (doc_id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), comp AS (
        SELECT doc_id, min(label) AS component FROM reach GROUP BY 1
    ), sizes AS (
        SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1
    )
    SELECT c.doc_id, c.component,
           CAST(s.cluster_size AS BIGINT) AS cluster_size,
           c.doc_id = c.component AS keep
    FROM comp c JOIN sizes s ON s.component = c.component
"""
