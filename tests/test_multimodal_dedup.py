"""Media dedup cluster resolution (operators/multimodal_dedup.py):
fixpoint margins on the media pair graphs, structural invariants of the
canonical picks, and the image/audio closed-form component structure the
oracles rely on. The query↔oracle hash parity itself runs in
tests/test_oracle_parity.py and the randomized doc-population family."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.operators.dedup import (
    CC_ROUNDS,
    connected_components,
)
from duckdb_parquet_parser_spark.operators.multimodal import (
    image_neardup_pairs,
    video_neardup_pairs,
)
from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
    MEDIA_CLIQUE_CC_ROUNDS,
    VIDEO_CC_ROUNDS,
    q_ns_mm_audio_dedup_cluster,
    q_ns_mm_image_dedup_cluster,
    q_ns_mm_video_dedup_cluster,
)
from duckdb_parquet_parser_spark.operators.multimodal_synth import (
    IMG_CLS_MOD,
    IMG_POISON_MOD,
    build_image_table,
    build_video_table,
)


def _fixpoint_margin(pairs, rounds: int = CC_ROUNDS) -> int:
    at = connected_components(pairs, rounds=rounds)
    past = connected_components(
        pairs, rounds=rounds + 1
    ).withColumnRenamed("component", "component2")
    return (
        at.join(past, "doc")
        .filter(F.col("component") != F.col("component2"))
        .count()
    )


def test_video_graph_fixpoint_margin(spark, sf_smoke):
    """The video pair graph is IRREGULAR (the match-fraction gate drops
    some same-class pairs), so the fixed round budget needs its own
    margin guard — same discipline as the SimHash graph
    (tests/test_dedup_scale.py): one extra round must change nothing.
    Pinned AT THE BUDGET THE QUERY RUNS (VIDEO_CC_ROUNDS = CC_ROUNDS —
    the oracle unrolls exactly that many rounds, see the constant's
    docstring for why the r17 cut to 3 was reverted)."""
    pairs = (
        video_neardup_pairs(build_video_table(spark, sf_smoke))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    assert _fixpoint_margin(pairs, VIDEO_CC_ROUNDS) == 0


def test_image_graph_fixpoint_margin(spark, sf_smoke):
    """Pinned at MEDIA_CLIQUE_CC_ROUNDS (r17): same-class decodable docs
    pair pairwise by construction, so components are cliques of diameter
    1 — one propagation round converges, the second round is margin."""
    pairs = (
        image_neardup_pairs(build_image_table(spark, sf_smoke))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    assert _fixpoint_margin(pairs, MEDIA_CLIQUE_CC_ROUNDS) == 0


def test_embed_graph_is_not_fixed_round_clusterable(spark, sf_smoke):
    """Round-11 dead-end, pinned as knowledge: an `ns_embed_dedup_cluster`
    query (CC over the ns_embed_neardup pair graph) was built and
    REVERTED. The synthetic embeddings are near-random (max pairwise
    cosine ≈ 0.5), so the 0.3-threshold graph is a sparse CHAIN: at
    sf0.001 the CC_ROUNDS=4 doubling budget leaves >100 mislabels (the
    oracle, unrolling the same rounds, agrees — parity alone masks
    under-convergence, which is exactly what the fixpoint-margin guard
    exists to catch), small-SF fixpoint needs ~12 rounds, and at sf0.1
    the graph collapses into ONE 1999-node component. This test pins
    the diagnosis: the graph IS connected-chain-shaped — which is WHY
    the certified query (`ns_embed_dedup_cluster`, embed_cluster.py,
    round 12) runs iterate-to-convergence CC against a WITH RECURSIVE
    fixpoint oracle: two INDEPENDENT convergence rules, so parity is a
    real check again. Do not re-land the fixed-round version; if this
    assertion ever flips (margin hits zero) the fixed-round pipeline
    became sufficient for THIS fixture, but the convergent query stays —
    real corpora don't promise bounded diameters either."""
    from duckdb_parquet_parser_spark.operators.similarity import (
        q_ns_embed_neardup,
    )

    pairs = (
        q_ns_embed_neardup(spark, sf_smoke)
        .select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
        .localCheckpoint(eager=True)
    )
    margin = _fixpoint_margin(pairs)
    assert margin > 0, (
        "the embed pair graph now converges within CC_ROUNDS — the "
        "fixed-round pipeline became sufficient for this fixture; the "
        "convergent ns_embed_dedup_cluster stays (see docstring)"
    )


def test_converged_cc_reaches_fixpoint_on_the_chain_graph(spark, sf_smoke):
    """The convergent variant must label the exact graph the fixed-round
    pipeline cannot: the embed cosine chain. Ground truth = a fixed-round
    run at a budget safely past the measured fixpoint (~12 rounds at the
    fixture SFs)."""
    from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
        connected_components_converged,
    )
    from duckdb_parquet_parser_spark.operators.similarity import (
        q_ns_embed_neardup,
    )

    pairs = (
        q_ns_embed_neardup(spark, sf_smoke)
        .select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
        .localCheckpoint(eager=True)
    )
    conv, rounds = connected_components_converged(pairs)
    truth = connected_components(pairs, rounds=16).withColumnRenamed(
        "component", "truth"
    )
    diff = (
        conv.join(truth, "doc")
        .filter(F.col("component") != F.col("truth"))
        .count()
    )
    assert diff == 0
    assert 2 <= rounds <= 16, rounds
    # every label is a real min: no node points above itself
    assert conv.filter(F.col("component") > F.col("doc")).count() == 0


def test_converged_cc_adversarial_long_path(spark):
    """A 200-node pure path — diameter far beyond CC_ROUNDS coverage —
    must resolve to ONE component labeled by its minimum node."""
    from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
        connected_components_converged,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a long, doc_b long"
    )
    conv, rounds = connected_components_converged(edges)
    rows = conv.collect()
    assert len(rows) == 200
    assert all(r.component == 0 for r in rows)
    # doubling: fixpoint in O(log diameter) rounds, not O(diameter)
    assert rounds <= 12, rounds


def test_image_components_are_class_groups(spark, sf_smoke):
    """The closed form the image/audio cluster oracles rest on: a
    component is EXACTLY a hash-class group with ≥ 2 decodable members —
    intra-class variant flips stay within Hamming 3, distinct classes
    differ in ≥ 5 bits. Verified against the real decode pipeline."""
    rows = q_ns_mm_image_dedup_cluster(spark, sf_smoke).collect()
    import pyarrow.parquet as pq
    import os

    doc_ids = (
        pq.read_table(
            os.path.join(sf_smoke, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for d in doc_ids:
        if d % IMG_POISON_MOD == 0:
            continue
        groups[1 + d % IMG_CLS_MOD].append(d)
    expect = {
        min(ds): len(ds) for ds in groups.values() if len(ds) >= 2
    }
    got = {r.component: r.cluster_size for r in rows}
    assert got == expect


def test_cluster_canonical_invariants(spark, sf_smoke):
    """Every cluster row: exactly one canonical per component,
    n_dropped = cluster_size - 1, cluster_size ≥ 2, and the canonical
    pick is deterministic (bit-count desc, doc_id asc) — re-ranking the
    members reproduces it."""
    for q in (q_ns_mm_image_dedup_cluster, q_ns_mm_audio_dedup_cluster):
        rows = q(spark, sf_smoke).collect()
        comps = [r.component for r in rows]
        assert len(comps) == len(set(comps))
        for r in rows:
            assert r.cluster_size >= 2
            assert r.n_dropped == r.cluster_size - 1
            assert 0 < r.canonical_bits < 64


def test_video_cluster_keep_is_min_id(spark, sf_smoke):
    rows = q_ns_mm_video_dedup_cluster(spark, sf_smoke).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert comp == min(m.doc_id for m in members)
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1 and keepers[0].doc_id == comp
        assert all(m.cluster_size == len(members) for m in members)


def test_converged_cc_matches_union_find_on_random_graphs(spark):
    """The convergent variant against an exact union-find on SEEDED
    RANDOM graphs — unlike the fixed-round test (test_dedup_scale.py),
    no rounds budget is supplied at all: convergence itself must find
    the right stopping point on every shape (paths glued to cliques,
    stars, sparse noise), and the probe must never stop early."""
    import random

    from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
        connected_components_converged,
    )

    def exact(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        edges = [(rng.randrange(70), rng.randrange(70)) for _ in range(50)]
        # glue a path onto a clique so diameter and density coexist
        edges += [(100 + i, 101 + i) for i in range(25)]
        edges += [(a, b) for a in range(200, 206) for b in range(a + 1, 206)]
        edges += [(125, 200)]  # path end → clique: one long component
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        want = exact(edges, nodes)
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        comp, rounds = connected_components_converged(df)
        got = {r["doc"]: r["component"] for r in comp.collect()}
        assert got == want, seed
        assert rounds <= 12, (seed, rounds)


def test_converged_cc_empty_edge_set(spark):
    """Zero near-dup pairs is a legitimate corpus state (a clean random
    seed, a threshold above the similarity ceiling): the convergent CC
    must return an EMPTY labeling after its second (empty) block, not
    burn max_rounds and raise — F.sum over an empty frame is NULL, which
    the sentinel-based probe must treat as a comparable value (code
    review r12)."""
    from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
        connected_components_converged,
    )

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    comp, rounds = connected_components_converged(empty)
    assert comp.count() == 0
    assert rounds <= 4, rounds  # two blocks, not the 64-round runaway
