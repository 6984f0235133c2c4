"""Round-16 pending queries (operators/pending_r16.py): the full
query-vs-oracle differential runs HERE every round even though the
queries aren't registered in the driver contract yet — the round-15
window is owed to the 49-query r12 rotation + 13 staged registrations,
and round 16 carries the REVIEW_r14 certified-module fixes (the
staging discipline that shipped pending_r13 → curation.py and
pending_r14 → relational_q9.py)."""

from __future__ import annotations

import pytest

from duckdb_parquet_parser_spark.operators.pending_r16 import (
    ORACLES_PENDING_R16,
    QUERIES_PENDING_R16,
    SAMPLE_K,
    SEMDEDUP_DROP_PCT,
    q_ns_semdedup_prune,
    q_ns_weighted_sample,
)
from duckdb_parquet_parser_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES_PENDING_R16))
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_pending_r16_query_matches_oracle(spark, name, sf_dir):
    res = compare_query(
        spark,
        sf_dir,
        name,
        QUERIES_PENDING_R16[name],
        ORACLES_PENDING_R16[name],
    )
    assert res.ok, res


def test_semdedup_drop_budget_semantics(spark, sf_smoke):
    """Invariants the hash doesn't explain: within each cluster exactly
    ``n * PCT // 100`` rows are dropped, the dropped set is the
    prototypicality HEAD (every dropped cos >= every kept cos, with the
    deterministic vec_id tiebreak), and every vector appears exactly
    once."""
    rows = q_ns_semdedup_prune(spark, sf_smoke).collect()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    saw_nontrivial = 0
    for cl, rs in by_cluster.items():
        n = len(rs)
        n_drop = n * SEMDEDUP_DROP_PCT // 100
        dropped = [r for r in rs if not r["kept"]]
        assert len(dropped) == n_drop, (cl, n, len(dropped))
        assert all(r["n_drop"] == n_drop for r in rs)
        rs.sort(key=lambda r: (-r["cos"], r["vec_id"]))
        # the drop set is exactly the head of the prototypicality order
        assert [not r["kept"] for r in rs] == [i < n_drop for i in range(n)]
        if n_drop:
            saw_nontrivial += 1
    # the fixture must actually exercise the budget (clusters of >= 4)
    assert saw_nontrivial > 0


def test_weighted_sample_is_weight_monotone_and_deterministic(
    spark, sf_smoke
):
    """The priority key's contract: identical across runs (hash-seeded,
    no RNG state), capped at SAMPLE_K per source, and monotone in the
    weight — for the SAME doc_id (same u), a doubled token count halves
    the key, so heavier docs can only move UP the order."""
    a = {
        (r["doc_id"], r["rank"])
        for r in q_ns_weighted_sample(spark, sf_smoke).collect()
    }
    b = {
        (r["doc_id"], r["rank"])
        for r in q_ns_weighted_sample(spark, sf_smoke).collect()
    }
    assert a == b and a
    per_source: dict = {}
    rows = q_ns_weighted_sample(spark, sf_smoke).collect()
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
        assert r["prio"] >= 0 and r["n_tokens"] > 0
    for src, rs in per_source.items():
        assert len(rs) <= SAMPLE_K
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), src


def test_weighted_sample_single_exchange_plan(spark, sf_smoke):
    """Scale lock: one zero-shuffle projection for (u, w), ONE
    non-broadcast exchange (the per-source rank window), no Python
    nodes."""
    from duckdb_parquet_parser_spark.plans import formatted_plan

    plan = formatted_plan(q_ns_weighted_sample(spark, sf_smoke))
    tree = plan.split("\n\n")[0]
    nbe = [
        ln
        for ln in tree.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(nbe) == 1, nbe
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("seed", [66, 5152])
def test_pending_r16_weighted_sample_on_random_docs(spark, tmp_path, seed):
    """Randomized docs-family pressure: null texts excluded on both
    sides, duplicate texts (u ties impossible — doc_id seeds the hash —
    but token-count ties are common), skewed source shapes."""
    import test_randomized_docs as docs

    sf_dir = docs._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_weighted_sample",
        QUERIES_PENDING_R16["ns_weighted_sample"],
        ORACLES_PENDING_R16["ns_weighted_sample"],
    )
    assert res.ok, res


@pytest.mark.parametrize("seed", [77, 5153])
def test_pending_r16_semdedup_on_random_embeddings(spark, tmp_path, seed):
    """Randomized embeddings-family pressure: zero vectors (cos pinned
    0), exact-duplicate cliques (round-6 cos ties broken by vec_id),
    tiny/large magnitudes — the k-means base is already certified on
    this family; the prune must stay hash-identical on top of it."""
    import test_randomized_embeddings as emb

    sf_dir = emb._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_semdedup_prune",
        QUERIES_PENDING_R16["ns_semdedup_prune"],
        ORACLES_PENDING_R16["ns_semdedup_prune"],
    )
    assert res.ok, res


def test_mixture_temperature_fixed_point_semantics(spark, sf_smoke):
    """Invariants behind the hash: w_micro is exactly
    floor(sqrt(n_tokens) * 1e6) (recomputed in Python — IEEE sqrt is
    correctly rounded, so all three computations agree bit-for-bit),
    shares are the exact integer division of exact integer sums (total
    within n_domains ulps-of-1 below 1e6), and temperature flattens the
    mix in the PAIRWISE sense (the property sqrt actually guarantees —
    pointwise betweenness vs uniform is false in general): share order
    follows token order, and the extreme share ratio is the square root
    of the extreme token ratio."""
    import math

    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        q_ns_mixture_temperature,
    )

    rows = q_ns_mixture_temperature(spark, sf_smoke).collect()
    assert rows
    total_w = sum(r["w_micro"] for r in rows)
    total_nt = sum(r["n_tokens"] for r in rows)
    n_dom = len(rows)
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    assert sum(r["share_ppm"] for r in rows) > 1_000_000 - n_dom
    for r in rows:
        assert r["w_micro"] == math.floor(
            math.sqrt(r["n_tokens"]) * 1_000_000
        )
        assert r["share_ppm"] == r["w_micro"] * 1_000_000 // total_w
    assert total_nt > 0 and n_dom > 1
    # pairwise flattening: ordering preserved; extreme ratio = sqrt
    by_nt = sorted(rows, key=lambda r: r["n_tokens"])
    shares = [r["share_ppm"] for r in by_nt]
    assert shares == sorted(shares)
    lo, hi = by_nt[0], by_nt[-1]
    if lo["n_tokens"] > 0 and lo["share_ppm"] > 0:
        got_ratio = hi["share_ppm"] / lo["share_ppm"]
        want_ratio = math.sqrt(hi["n_tokens"] / lo["n_tokens"])
        assert abs(got_ratio - want_ratio) < 0.01 * want_ratio
        # and it genuinely flattens: the share ratio is far below raw
        assert got_ratio < hi["n_tokens"] / lo["n_tokens"]


def test_cc_incremental_equals_full_recompute(spark, sf_smoke):
    """Merge ≡ recompute, Spark-vs-Spark (the oracle already proves it
    vs DuckDB's closure; this pins the two SPARK pipelines — the
    incremental star+batch derivation and the certified full-graph
    ns_dedup_components — to the identical labeling, so a drift in
    either surfaces without a DuckDB run)."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        q_ns_dedup_components,
    )
    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        q_ns_cc_incremental,
    )

    inc = {
        (r["doc_id"], r["component"], r["cluster_size"], r["keep"])
        for r in q_ns_cc_incremental(spark, sf_smoke).collect()
    }
    full = {
        (r["doc_id"], r["component"], r["cluster_size"], r["keep"])
        for r in q_ns_dedup_components(spark, sf_smoke).collect()
    }
    assert inc == full and inc


def test_cc_incremental_batch_split_is_real(spark, sf_smoke):
    """The fixture must actually exercise the merge: the batch slice
    carries edges (otherwise the query degenerates to relabeling), and
    at least one merged component contains BOTH corpus and batch docs
    (a corpus↔new edge merged clusters across the split)."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        INCR_MOD,
        INCR_REM,
    )
    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        q_ns_cc_incremental,
    )

    rows = q_ns_cc_incremental(spark, sf_smoke).collect()
    comps: dict = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(
            r["doc_id"] % INCR_MOD == INCR_REM
        )
    assert any(v == {True, False} for v in comps.values())
    assert any(True in v for v in comps.values())


@pytest.mark.parametrize("seed", [88, 5154])
def test_pending_r16_cc_incremental_on_random_docs(spark, tmp_path, seed):
    """Randomized duplicate-graph pressure (the components family's own
    harness): random cluster shapes, chains, cliques — the incremental
    derivation must stay hash-identical to the from-scratch recursive
    closure on ANY graph, including ones where the batch slice is empty
    or merges many corpus clusters at once."""
    import test_randomized_docs as docs

    sf_dir = docs._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_cc_incremental",
        QUERIES_PENDING_R16["ns_cc_incremental"],
        ORACLES_PENDING_R16["ns_cc_incremental"],
    )
    assert res.ok, res


def test_skew_safe_sample_keepers_equivalent(spark, sf_smoke):
    """The salted two-phase sample must return EXACTLY the full-window
    winners with identical ranks — checked end-to-end and on a
    deliberately skewed one-megasource frame (the per_source_keepers
    equivalence discipline)."""
    import pyspark.sql.functions as F

    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        per_source_sample_keepers,
    )

    full = q_ns_weighted_sample(spark, sf_smoke)
    want = {
        (r["doc_id"], r["source"], r["rank"]) for r in full.collect()
    }
    base = full.select("doc_id", "source", "n_tokens", "prio")
    got = {
        (r["doc_id"], r["source"], r["rank"])
        for r in per_source_sample_keepers(base, SAMPLE_K).collect()
    }
    assert got == want and got
    # skewed: one megasource absorbing ~4/5 of all docs
    skewed = base.withColumn(
        "source",
        F.when(F.col("doc_id") % 5 != 0, "mega").otherwise("rest"),
    )
    got_mega = sorted(
        (r["rank"], r["doc_id"])
        for r in per_source_sample_keepers(skewed, 25).collect()
        if r["source"] == "mega"
    )
    rows = sorted(
        (r["prio"], r["doc_id"])
        for r in skewed.filter("source = 'mega'").collect()
    )[:25]
    expect = sorted((i + 1, doc) for i, (_, doc) in enumerate(rows))
    assert got_mega == expect


def test_embed_lineage_stage_semantics(spark, sf_smoke):
    """Composition invariants the hash alone doesn't explain: every
    vector labeled exactly once; the 'semdedup' set IS the prune's
    dropped set (stage order — a pruned vector can never be labeled
    duplicate); 'duplicate' vectors are survivors; every stage actually
    fires on the fixture."""
    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        q_ns_embed_curation_lineage,
    )

    lineage = {
        r["vec_id"]: r["stage"]
        for r in q_ns_embed_curation_lineage(spark, sf_smoke).collect()
    }
    prune = {
        r["vec_id"]: r["kept"]
        for r in q_ns_semdedup_prune(spark, sf_smoke).collect()
    }
    assert set(lineage) == set(prune)
    assert {v for v, s in lineage.items() if s == "semdedup"} == {
        v for v, k in prune.items() if not k
    }
    assert all(
        prune[v] for v, s in lineage.items() if s == "duplicate"
    )
    stages = set(lineage.values())
    assert stages == {"semdedup", "duplicate", "kept"}


@pytest.mark.parametrize("seed", [99, 5155])
def test_pending_r16_embed_lineage_on_random_embeddings(
    spark, tmp_path, seed
):
    """Randomized embeddings pressure on the full composition: zero
    vectors, exact-duplicate cliques, chain fragments — the survivor
    restriction reshapes the near-dup graph differently on every seed,
    and the recursive-closure oracle adjudicates the whole pipeline."""
    import test_randomized_embeddings as emb

    sf_dir = emb._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_embed_curation_lineage",
        QUERIES_PENDING_R16["ns_embed_curation_lineage"],
        ORACLES_PENDING_R16["ns_embed_curation_lineage"],
    )
    assert res.ok, res


def test_bpe_pair_counts_semantics(spark, sf_smoke):
    """Structural pins: ranks are a dense 1..K prefix in (count DESC,
    pair ASC) order; every pair is exactly two characters; counts
    recompute in Python from the raw fixture text."""
    from collections import Counter

    from duckdb_parquet_parser_spark.catalog import load_table
    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        BPE_TOP_K,
        q_ns_bpe_pair_counts,
    )

    rows = q_ns_bpe_pair_counts(spark, sf_smoke).collect()
    rows.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= BPE_TOP_K
    key = [(-r["n"], r["pair"]) for r in rows]
    assert key == sorted(key)
    assert all(len(r["pair"]) == 2 for r in rows)
    # Python reference over the raw text
    want = Counter()
    for (text,) in load_table(spark, sf_smoke, "documents").select(
        "text"
    ).collect():
        if text is None:
            continue
        for w in text.split(" "):
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    for r in rows:
        assert want[r["pair"]] == r["n"], r


@pytest.mark.parametrize("seed", [111, 5156])
def test_pending_r16_bpe_on_random_docs(spark, tmp_path, seed):
    """Randomized docs pressure — the load-bearing assumption is that
    BOTH engines' substring is character (code-point) based; the
    unicode-gram fixtures adjudicate it on every seed."""
    import test_randomized_docs as docs

    sf_dir = docs._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_bpe_pair_counts",
        QUERIES_PENDING_R16["ns_bpe_pair_counts"],
        ORACLES_PENDING_R16["ns_bpe_pair_counts"],
    )
    assert res.ok, res
