"""Round-16 PENDING queries — staged in round 14, deliberately NOT
registered: the round-15 window is already owed to the 49-query
r12-certified rotation plus the 13 staged round-15 registrations
(COVERAGE.md "Round-15 window plan"), and round 16 carries the
scheduled certified-module fixes (REVIEW_r14.md #2-#4). Same staging
discipline as pending_r13 → curation.py and pending_r14 →
relational_q9.py: the full query-vs-oracle differential runs every
round via tests/test_pending_r16.py, so registration is a rename.

- ``ns_semdedup_prune`` — SemDeDup/prototype-style SEMANTIC pruning
  (Abbas et al. 2023 "SemDeDup", Sorscher et al. 2022 "Beyond neural
  scaling laws": within semantic clusters, the most prototypical
  examples are the most redundant): take the certified spherical
  k-means assignment (``ns_kmeans_embed`` — imported, not copied, so
  the two derivations can never drift), rank every vector inside its
  cluster by prototypicality (cosine to the round-2 centroid, the
  certified round-6 value; vec_id tiebreak), and DROP the top
  ``SEMDEDUP_DROP_PCT`` percent of each cluster (integer floor —
  ``n*pct // 100`` on both engines), keeping the harder tail. Output:
  every vector with its cluster, cos, prototypicality rank, the
  cluster's drop budget, and the keep decision. Scale shape: the
  k-means assignment is the priced pipeline (two Lloyd rounds, K×DIM
  partial aggs); the prune adds ONE window over the cluster key — the
  same single-exchange shape as every per-group rank in the engine.
  At 100 TB the window never sees the vectors, only (vec_id, cluster,
  cos) — 20 bytes/row.

- ``ns_weighted_sample`` — deterministic WEIGHTED sampling without
  replacement, per source: each doc draws a hash-seeded uniform
  ``u`` (48-bit md5 prefix — exact in an IEEE double) and competes
  with priority key ``u / w`` where the weight ``w`` is its token
  count; the ``SAMPLE_K`` smallest keys per source win. Monotone in
  w (doubling a doc's tokens halves its expected key) with full
  hash-determinism, so both engines select the identical sample —
  the curation-pipeline "length-weighted subsample per domain" step.
  (The exactly-∝-w Efraimidis–Spirakis key is ``-ln(u)/w``; ``ln`` is
  not bit-stable across engines, so the certified definition uses the
  division key — selection stays weight-monotone and deterministic,
  which is what a reproducible pipeline needs.) Scale shape: one
  zero-shuffle projection for (u, w), ONE hash exchange on source for
  the rank window; the salted pre-prune of ``per_source_keepers``
  applies verbatim for skewed sources (a row outside its salt
  bucket's top-K can never be in the global top-K).

- ``ns_mixture_temperature`` (bottom) — the multilingual p ∝ n^α
  up-sampling rule at α = 0.5 in exact fixed-point (floor(sqrt·1e6) +
  integer-division shares — no transcendental drift), completing the
  mixture family: equalize / budget-fill / temperature.

- ``ns_cc_incremental`` (bottom) — INCREMENTAL duplicate-cluster
  maintenance, completing the incrementality triad (signatures /
  sketches / clusters): run N's persisted labels collapse to stars,
  run N+1 adds only the batch's band-join edges, and the convergent CC
  over stars ∪ batch edges ≡ the full recompute — certified against
  the full-graph ``WITH RECURSIVE`` closure oracle imported verbatim.

- ``per_source_sample_keepers`` (bottom, library) — the skew-safe
  two-phase variant of the weighted sample, equivalence-pinned.

Reference analog: none (no relational/curation surface in the
reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .similarity import ORACLES as _SIM_ORACLES
from .similarity import q_ns_kmeans_embed

SEMDEDUP_DROP_PCT = 25  # drop the most-prototypical quarter per cluster


def q_ns_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic prune over the certified k-means clusters: per cluster,
    rank by prototypicality (cos DESC, vec_id ASC) and drop the integer
    ``n * PCT // 100`` head. The straggler math is integer on both
    engines; cos is the certified round-6 value, so rank ties are
    deterministic."""
    assigned = q_ns_kmeans_embed(spark, sf_dir)
    w_rank = Window.partitionBy("cluster").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    w_all = Window.partitionBy("cluster")
    ranked = assigned.select(
        "vec_id",
        "cluster",
        "cos",
        F.row_number().over(w_rank).alias("proto_rank"),
        F.count(F.lit(1)).over(w_all).alias("n_cluster"),
    )
    # integer floor division, spelled to match the oracle's `//`
    n_drop = F.floor(
        (F.col("n_cluster") * SEMDEDUP_DROP_PCT) / F.lit(100)
    ).cast("long")
    return ranked.select(
        "vec_id",
        "cluster",
        "cos",
        "proto_rank",
        n_drop.alias("n_drop"),
        (F.col("proto_rank") > n_drop).alias("kept"),
    )


SAMPLE_K = 40  # winners per source
_U48 = "cast(conv(substring(md5(concat('ws:', cast(doc_id as string))), 1, 12), 16, 10) as double)"


def q_ns_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-weighted sample per source: priority key =
    u48 / n_tokens (both operands exact in double, IEEE division is
    correctly rounded — bit-identical across engines); SAMPLE_K
    smallest keys win. Null AND empty texts never compete (the empty
    string splits to [''] — size 1 on both engines — so the emptiness
    filter is explicit, not implied by the token count; code review
    r14)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    ).filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    ).drop("text")
    keyed = docs.withColumn(
        "prio", F.expr(_U48) / F.col("n_tokens")
    )
    w = Window.partitionBy("source").orderBy(F.asc("prio"), F.asc("doc_id"))
    # prio is NOT rounded: both operands are integers exact in double and
    # IEEE division is correctly rounded, so the engines' doubles are
    # bit-identical — unlike the cosine family there is no float-path
    # divergence to absorb
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SAMPLE_K)
        .select("doc_id", "source", "n_tokens", "prio", "rank")
    )


QUERIES_PENDING_R16 = {
    "ns_semdedup_prune": q_ns_semdedup_prune,
    "ns_weighted_sample": q_ns_weighted_sample,
}

ORACLES_PENDING_R16 = {
    # the certified k-means oracle verbatim as the base CTE — one
    # derivation, two consumers, zero drift (the HLL-register pattern)
    "ns_semdedup_prune": f"""
        WITH base AS ({_SIM_ORACLES["ns_kmeans_embed"]}),
        ranked AS (
            SELECT vec_id, cluster, cos,
                   CAST(row_number() OVER (
                       PARTITION BY cluster
                       ORDER BY cos DESC, vec_id
                   ) AS INT) AS proto_rank,
                   count(*) OVER (PARTITION BY cluster) AS n_cluster
            FROM base
        )
        SELECT vec_id, cluster, cos, proto_rank,
               CAST(n_cluster * {SEMDEDUP_DROP_PCT} // 100 AS BIGINT)
                   AS n_drop,
               proto_rank > (n_cluster * {SEMDEDUP_DROP_PCT} // 100)
                   AS kept
        FROM ranked
    """,
    "ns_weighted_sample": f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(CAST(('0x' || substring(
                       md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12))
                       AS BIGINT) AS DOUBLE)
                     / len(string_split(text, ' ')) AS prio
            FROM documents
            WHERE text IS NOT NULL AND text <> ''
        ),
        ranked AS (
            SELECT doc_id, source, n_tokens, prio,
                   CAST(row_number() OVER (
                       PARTITION BY source ORDER BY prio, doc_id
                   ) AS INT) AS rank
            FROM keyed
        )
        SELECT doc_id, source, n_tokens, prio, rank
        FROM ranked WHERE rank <= {SAMPLE_K}
    """,
}


_W_MICRO = 1_000_000  # sqrt fixed-point scale (temperature α = 0.5)
_PPM = 1_000_000  # share scale


def q_ns_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-sampling
    p_i ∝ n_i^α rule, α = 0.5): per (lang, source) domain, the token
    count, its sqrt fixed-point weight, and the domain's parts-per-
    million share of the temperature-scaled mass.

    Completes the mixture family: ``ns_mixture_weights`` equalizes
    (α = 0), ``ns_weighted_token_mix`` fills uniform budgets, this one
    up-samples the tail the way multilingual corpora are actually
    mixed. Cross-engine exactness without transcendentals:
    ``w = floor(sqrt(n_tokens) * 1e6)`` — IEEE sqrt and multiply are
    correctly rounded, floor is exact, so the BIGINT weights are
    bit-identical on both engines, and the share is integer division
    of exact integer sums: ``share_ppm = w * 1e6 // Σw``.

    Scale shape: ONE hash aggregation of (domain → token count); the
    share window runs over the already-aggregated #domains-row table
    (the ns_mixture_weights pattern — the single-task stage never sees
    the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    nt = (
        F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        .otherwise(F.lit(0))
        .cast("long")
    )
    dom = (
        docs.select("lang", "source", nt.alias("nt"))
        .groupBy("lang", "source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    w_micro = F.floor(F.sqrt(F.col("n_tokens")) * _W_MICRO).cast("long")
    keyed = dom.select("lang", "source", "n_tokens", w_micro.alias("w_micro"))
    # the share multiplies w_micro (up to ~2^63/1e6 at extreme domain
    # sizes) by 1e6 — widen to DECIMAL(38,0) BEFORE the multiply so the
    # arithmetic can't wrap under non-ANSI long math while the oracle
    # (HUGEINT) errors or disagrees (code review r14)
    return keyed.select(
        "lang",
        "source",
        "n_tokens",
        "w_micro",
        F.expr(
            f"CAST(CAST(w_micro AS DECIMAL(38,0)) * {_PPM}"
            " DIV sum(CAST(w_micro AS DECIMAL(38,0))) OVER () AS BIGINT)"
        ).alias("share_ppm"),
    )


QUERIES_PENDING_R16["ns_mixture_temperature"] = q_ns_mixture_temperature

ORACLES_PENDING_R16["ns_mixture_temperature"] = f"""
    WITH dom AS (
        SELECT lang, source,
               CAST(sum(CASE WHEN text IS NOT NULL
                        THEN len(string_split(text, ' ')) ELSE 0 END)
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    ),
    w AS (
        SELECT lang, source, n_tokens,
               CAST(floor(sqrt(n_tokens) * {_W_MICRO}) AS BIGINT)
                   AS w_micro
        FROM dom
    )
    SELECT lang, source, n_tokens, w_micro,
           CAST(CAST(w_micro AS HUGEINT) * {_PPM}
                // sum(CAST(w_micro AS HUGEINT)) OVER () AS BIGINT)
               AS share_ppm
    FROM w
"""


def q_ns_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL duplicate-cluster maintenance — the graph-side
    completion of the engine's incrementality story (signatures:
    ``ns_dedup_incremental``; sketches: ``ns_hll_incremental``; now the
    CLUSTERS themselves): run N's persisted (doc, component) label
    table plus ONLY the new batch's near-dup edges reproduce the full
    recompute's clustering exactly, without ever re-walking the corpus
    pair graph.

    Construction (the standard star-contraction argument): every run-N
    cluster collapses to a STAR — one (member, component) edge per
    non-representative member, O(#clustered docs) edges regardless of
    how dense the original pair graph was — and the convergent CC runs
    over stars ∪ batch edges. Contracting connected subgraphs preserves
    connectivity, and min-labels survive because each star carries its
    component's min doc_id, so the merged labeling IS the full graph's
    labeling. The oracle has no incremental path: it is the
    ``WITH RECURSIVE`` transitive closure of the FULL pair set (the
    certified ``ns_dedup_components_converged`` oracle, imported
    verbatim), so the hash match certifies merge ≡ recompute exactly —
    the ``ns_hll_incremental`` pattern applied to graphs.

    Scale shape (100 TB corpus, small daily batch): run N+1 reads the
    label table (narrow, one row per clustered doc — emulated here
    with an eager checkpoint standing in for the persisted parquet),
    band-joins ONLY the batch (the ``ns_dedup_incremental`` plan —
    corpus↔corpus candidates impossible by construction), and the CC
    rounds run over star+batch edges, logarithmic in the diameter of
    the MERGED clusters only. The corpus CC below prices what run N
    already paid; in production it is a table read."""
    from ..session import checkpoint_df
    from .dedup import (
        INCR_MOD,
        INCR_REM,
        _simhash_pairs_materialized,
        connected_components_converged,
    )

    # the memoized pair table, not the lazy builder: THREE graph
    # consumers read it in a session (corpus CC, merged CC, and the
    # certified ns_dedup_components the equivalence test runs) — the
    # exact consumer class dedup._simhash_pairs_materialized exists for
    # (code review r14)
    pairs = _simhash_pairs_materialized(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    new_a = F.col("doc_a") % INCR_MOD == INCR_REM
    new_b = F.col("doc_b") % INCR_MOD == INCR_REM
    corpus_pairs = pairs.filter(~new_a & ~new_b)
    batch_pairs = pairs.filter(new_a | new_b)
    # run N's artifact: the corpus labeling, materialized (stand-in for
    # the persisted parquet label table a real pipeline reads back)
    labels_old, _ = connected_components_converged(corpus_pairs)
    labels_old = checkpoint_df(labels_old, eager=True)
    star = labels_old.filter(F.col("doc") != F.col("component")).select(
        F.col("doc").alias("doc_a"), F.col("component").alias("doc_b")
    )
    merged, _ = connected_components_converged(
        star.unionByName(batch_pairs)
    )
    w_size = F.count(F.lit(1)).over(Window.partitionBy("component"))
    return merged.select(
        F.col("doc").alias("doc_id"),
        "component",
        w_size.alias("cluster_size"),
        (F.col("doc") == F.col("component")).alias("keep"),
    )


QUERIES_PENDING_R16["ns_cc_incremental"] = q_ns_cc_incremental

# the full-graph recursive-closure oracle VERBATIM — the whole point:
# the oracle recomputes from scratch, the query merges, the hash match
# is the merge ≡ recompute theorem re-proved on every fixture
from .curation import ORACLES as _CUR_ORACLES  # noqa: E402

ORACLES_PENDING_R16["ns_cc_incremental"] = _CUR_ORACLES[
    "ns_dedup_components_converged"
]


SAMPLE_SALTS = 32  # == curation.SOURCE_CAP_SALTS; see consolidation note


def per_source_sample_keepers(
    df: DataFrame, k: int = SAMPLE_K
) -> DataFrame:
    """Skew-safe KEPT-ONLY variant of the weighted sample for 100 TB —
    the ``per_source_keepers`` two-phase discipline applied to the
    priority key. Pruning argument (simpler than the token-budget one
    because the key is per-row, not cumulative): a row's global rank is
    ≥ its rank inside its own salt bucket, so a row ranked > k in its
    bucket can never be in the source's global top-k. Phase 1 keeps
    each bucket's top-k (≤ SALTS × k candidate rows per source — a
    constant); phase 2 re-ranks the candidates exactly. Input:
    (doc_id, source, n_tokens, prio); output: the winners with their
    exact global rank (equivalence pinned in tests/test_pending_r16.py
    on a deliberately skewed one-megasource frame).

    Consolidation note (code review r14): this is the third instance of
    the salted two-phase top-K shape (curation.per_source_keepers ranks
    by quality, pending_r14.per_source_token_keepers runs a budget SUM,
    this one ranks by priority key). The rank-based pair should share
    one helper parameterized on the orderBy spec — scheduled for the
    round-16 curation rotation (REVIEW_r14.md #5), since touching
    curation.py now would re-head its certified queries mid-window."""
    salted = df.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(SAMPLE_SALTS))
    )
    w_local = Window.partitionBy("source", "_salt").orderBy(
        F.asc("prio"), F.asc("doc_id")
    )
    cands = (
        salted.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_salt", "_lr")
    )
    w_global = Window.partitionBy("source").orderBy(
        F.asc("prio"), F.asc("doc_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
    )


#: The lineage runs CC on the SURVIVOR SUBGRAPH, whose diameter can
#: EXCEED the full graph's (removing vertices removes shortcuts: the
#: sf0.01 fixture needs 12 rounds where the full graph converges in
#: ≤ 10 — measured, stable across evaluations). 32 is the runaway
#: ceiling, not a tuning knob; the fixtures use ≤ 12.
LINEAGE_CC_MAX_ROUNDS = 32


def q_ns_embed_curation_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The EMBEDDING-side pipeline capstone, mirroring
    ``ns_curation_lineage`` on the text side: every vector labeled with
    the first stage that dropped it — ``semdedup`` (pruned as
    most-prototypical inside its k-means cluster), ``duplicate`` (a
    near-dup cluster member on the SURVIVOR graph that is not the
    representative), or ``kept``. Stage order is load-bearing and
    certified: the near-dup graph is restricted to semdedup SURVIVORS
    (both endpoints), so a pair whose better half was pruned cannot
    mark the other as duplicate — exactly the pipeline semantics a real
    embedding-curation job has, and a composition the per-stage
    certifications alone cannot prove.

    Oracle independence: the Spark side composes the three certified
    pipelines (k-means prune window, banded IVF near-dup join,
    convergent CC); the oracle recomputes all three from scratch with
    DuckDB's own machinery (correlated windows + a WITH RECURSIVE
    closure over the survivor-filtered pair set) — the lossless-
    composition theorem re-proved on every fixture, the text lineage's
    pattern.

    Scale shape: semdedup adds one 20-byte-row window on the priced
    Lloyd pipeline; the survivor restriction is two broadcast-size semi
    joins on vec_id BEFORE the pair verification; CC rounds are
    logarithmic on the restricted (smaller) graph; the final label is
    one left join of two narrow frames."""
    from .dedup import connected_components_converged
    from .similarity import q_ns_embed_neardup

    kept = q_ns_semdedup_prune(spark, sf_dir).select("vec_id", "kept")
    survivors = kept.filter(F.col("kept")).select("vec_id")
    pairs = (
        q_ns_embed_neardup(spark, sf_dir)
        .join(
            survivors.select(F.col("vec_id").alias("vec_a")), "vec_a"
        )
        .join(
            survivors.select(F.col("vec_id").alias("vec_b")), "vec_b"
        )
        .select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )
    comp, _ = connected_components_converged(
        pairs, max_rounds=LINEAGE_CC_MAX_ROUNDS
    )
    dup = comp.filter(F.col("doc") != F.col("component")).select(
        F.col("doc").alias("vec_id"), F.lit(True).alias("_dup")
    )
    return (
        kept.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.when(~F.col("kept"), F.lit("semdedup"))
            .when(F.col("_dup").isNotNull(), F.lit("duplicate"))
            .otherwise(F.lit("kept"))
            .alias("stage"),
        )
    )


QUERIES_PENDING_R16["ns_embed_curation_lineage"] = (
    q_ns_embed_curation_lineage
)

ORACLES_PENDING_R16["ns_embed_curation_lineage"] = f"""
    WITH RECURSIVE km AS (
        {_SIM_ORACLES["ns_kmeans_embed"]}
    ), ranked AS (
        SELECT vec_id,
               row_number() OVER (
                   PARTITION BY cluster ORDER BY cos DESC, vec_id
               ) AS pr,
               count(*) OVER (PARTITION BY cluster) AS n
        FROM km
    ), keepset AS (
        SELECT vec_id,
               pr > (n * {SEMDEDUP_DROP_PCT} // 100) AS kept
        FROM ranked
    ), rawpairs AS (
        {_SIM_ORACLES["ns_embed_neardup"]}
    ), pairs AS (
        SELECT vec_a, vec_b FROM rawpairs
        JOIN keepset a ON a.vec_id = vec_a AND a.kept
        JOIN keepset b ON b.vec_id = vec_b AND b.kept
    ), edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT vec_b, vec_a FROM pairs
    ), reach (vec_id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.vec_id = e.dst
    ), comp AS (
        SELECT vec_id, min(label) AS component FROM reach GROUP BY vec_id
    )
    SELECT k.vec_id,
           CASE WHEN NOT k.kept THEN 'semdedup'
                WHEN c.component IS NOT NULL AND c.component <> k.vec_id
                    THEN 'duplicate'
                ELSE 'kept' END AS stage
    FROM keepset k LEFT JOIN comp c ON c.vec_id = k.vec_id
"""


BPE_TOP_K = 50  # merge candidates reported


def q_ns_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer TRAINING, distributed: corpus-
    wide counts of adjacent character pairs inside whitespace words —
    the statistic whose argmax is the first merge rule (Sennrich et al.
    2016). Output: the ``BPE_TOP_K`` most frequent pairs with count and
    rank (count DESC, pair ASC — fully deterministic).

    Engine-exactness note: pair extraction is ``substring(w, i, 2)``
    over character (code-point) indices — both engines' substring is
    character-based, and the randomized docs family (unicode grams)
    adjudicates that assumption every round.

    Scale shape: words and pairs are zero-shuffle projections
    (split → explode → transform/sequence → explode); ONE hash
    aggregation with map-side partials; the rank window runs over the
    aggregated pair table (vocabulary-sized, not corpus-sized). A full
    BPE trainer iterates this exact job with a broadcast merge table —
    the per-iteration cost at 100 TB is this one aggregation."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_rank = Window.partitionBy().orderBy(F.desc("n"), F.asc("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= BPE_TOP_K)
        .select("pair", "n", "rank")
    )


QUERIES_PENDING_R16["ns_bpe_pair_counts"] = q_ns_bpe_pair_counts

ORACLES_PENDING_R16["ns_bpe_pair_counts"] = f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
        -- scalar list range, not the table function (DuckDB's lateral
        -- range rejects column parameters)
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> substring(w, CAST(i AS INT), 2))) AS pair
        FROM words WHERE len(w) >= 2
    ),
    counts AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY pair
    ),
    ranked AS (
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT)
                   AS rank
        FROM counts
    )
    SELECT pair, n, rank FROM ranked WHERE rank <= {BPE_TOP_K}
"""


# ---------------------------------------------------------------------------
# REGISTERED surface (round 17): ns_semdedup_prune + ns_cc_incremental
# promoted from the staged tranche into the driver contract — VERDICT
# r16 #5's top-leverage pair (the semantic prune bounds 100 TB embedding
# curation by clusters, never pairs; the incremental CC completes the
# incrementality triad signatures/sketches/clusters). Registration is
# the promised rename, not new risk: both have run their DuckDB
# differentials at sf0.001+sf0.01 every round since r14
# (tests/test_pending_r16.py) plus the randomized pending16 families,
# and ns_cc_incremental is pre-certified conf-invariant under AQE-off /
# broadcast-off / shuffle=7 (tests/test_conf_robustness.py). The other
# staged pending_r16 queries stay in QUERIES_PENDING_R16 until their
# r18+ slots.
# ---------------------------------------------------------------------------

QUERIES = {
    "ns_semdedup_prune": q_ns_semdedup_prune,
    "ns_cc_incremental": q_ns_cc_incremental,
}
ORACLES = {name: ORACLES_PENDING_R16[name] for name in QUERIES}
