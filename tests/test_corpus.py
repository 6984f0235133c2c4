"""Corpus-prep operators: packing invariants, prefix-sum equivalence,
vocabulary sanity, k-means behavior. Value-level parity vs DuckDB is
covered by test_oracle_parity; these pin the algorithmic properties."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_parquet_parser_spark.catalog import load_table
from duckdb_parquet_parser_spark.operators.corpus import (
    SEQ_LEN,
    q_ns_seq_pack,
    q_ns_vocab_topk,
)
from duckdb_parquet_parser_spark.operators.similarity import (
    K_CLUSTERS,
    q_ns_kmeans_embed,
)


def test_seq_pack_matches_global_window_formula(spark, sf_smoke):
    """The two-pass prefix-sum plan must equal the single-task
    Window.orderBy formula exactly (same check as the positional ops)."""
    df = load_table(spark, sf_smoke, "documents")
    nt = F.when(
        F.col("text").isNotNull(), F.size(F.split("text", " "))
    ).otherwise(F.lit(0)).cast("long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        (r["doc_id"], r["off"])
        for r in df.select(
            "doc_id", F.coalesce(F.sum(nt).over(w), F.lit(0)).alias("off")
        )
        .filter(nt > 0)
        .collect()
    }
    got = {
        (r["doc_id"], r["tok_offset"])
        for r in q_ns_seq_pack(spark, sf_smoke).collect()
    }
    assert got == ref


def test_seq_pack_invariants(spark, sf_smoke):
    rows = q_ns_seq_pack(spark, sf_smoke).collect()
    total = sum(r["n_tokens"] for r in rows)
    last = max(rows, key=lambda r: r["tok_offset"])
    # the stream is dense: offsets tile [0, total) with no gaps or overlaps
    assert last["tok_offset"] + last["n_tokens"] == total
    for r in rows:
        assert 0 <= r["seq_offset"] < SEQ_LEN
        assert r["seq_first"] == r["tok_offset"] // SEQ_LEN
        assert r["seq_first"] <= r["seq_last"]


def test_vocab_topk_agrees_with_direct_count(spark, sf_smoke):
    top = q_ns_vocab_topk(spark, sf_smoke).collect()
    assert 0 < len(top) <= 100
    # re-derive the winner's doc_freq independently
    df = load_table(spark, sf_smoke, "documents")
    w0 = top[0]
    n = (
        df.filter(F.array_contains(F.split("text", " "), w0["word"]))
        .count()
    )
    assert n == w0["doc_freq"]
    # sorted by (doc_freq, total_freq, word)
    keys = [(-r["doc_freq"], -r["total_freq"], r["word"]) for r in top]
    assert keys == sorted(keys)


def test_kmeans_assigns_every_vector_deterministically(spark, sf_smoke):
    a = q_ns_kmeans_embed(spark, sf_smoke)
    rows = a.collect()
    n_vec = load_table(spark, sf_smoke, "embeddings").count()
    assert len(rows) == n_vec
    assert {r["cluster"] for r in rows} <= set(range(K_CLUSTERS))
    # Lloyd update must actually move centroids: second run is identical
    # (determinism), and assignments differ from the init-centroid-only
    # assignment for at least one vector.
    again = {(r["vec_id"], r["cluster"]) for r in q_ns_kmeans_embed(spark, sf_smoke).collect()}
    assert {(r["vec_id"], r["cluster"]) for r in rows} == again


def test_chunk_split_covers_text_with_overlap(spark, sf_smoke):
    """Chunk k starts at 1 + k*STRIDE; consecutive chunks overlap by
    WIDTH-STRIDE chars; the chunk set tiles every document exactly (the
    last chunk reaches the end, no chunk starts past it)."""
    from duckdb_parquet_parser_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_WIDTH,
        q_ns_chunk_split,
    )

    rows = q_ns_chunk_split(spark, sf_smoke).collect()
    assert rows
    lens = {
        r["doc_id"]: r["len"]
        for r in load_table(spark, sf_smoke, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.length("text").alias("len"))
        .collect()
    }
    by_doc = {}
    for r in rows:
        assert r["chunk_start"] == 1 + r["chunk_idx"] * CHUNK_STRIDE
        assert 1 <= r["chunk_len"] <= CHUNK_WIDTH
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        last = chunks[-1]
        n = lens[doc_id]
        # last chunk reaches the end of the text ...
        assert last["chunk_start"] + last["chunk_len"] - 1 == n
        assert last["chunk_start"] <= n
        # ... and is NOT redundant: the previous chunk must not already
        # cover the end (the naive every-start-position rule emitted a
        # strict-suffix duplicate tail for ~25% of lengths, code-review r6)
        if len(chunks) >= 2:
            prev = chunks[-2]
            assert prev["chunk_start"] + CHUNK_WIDTH - 1 < n
        # full chunks are exactly WIDTH; only the tail may be short
        for c in chunks[:-1]:
            assert c["chunk_len"] == CHUNK_WIDTH


def test_tfidf_topterms_ranks_and_bounds(spark, sf_smoke):
    """Per doc: at most TOP_K terms, ranks 1..k dense, ordered by
    (rounded score desc, term); df never exceeds the corpus size and a
    term appearing in every doc scores ~ln((N+1)/(N+1)) = 0."""
    from duckdb_parquet_parser_spark.operators.text import (
        TFIDF_TOP_K,
        q_ns_tfidf_topterms,
    )

    rows = q_ns_tfidf_topterms(spark, sf_smoke).collect()
    assert rows
    n_docs = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("text").isNotNull())
        .count()
    )
    by_doc = {}
    for r in rows:
        assert 1 <= r["df"] <= n_docs
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, terms in by_doc.items():
        terms.sort(key=lambda r: r["rank"])
        assert 1 <= len(terms) <= TFIDF_TOP_K
        assert [t["rank"] for t in terms] == list(range(1, len(terms) + 1))
        keys = [(-t["score"], t["term"]) for t in terms]
        assert keys == sorted(keys)


def test_chunk_formula_tiles_every_length_exhaustively():
    """Pure-arithmetic exhaustive check of the chunk-count formula for
    every document length 1..2000 (no Spark round-trip): chunks cover
    [1, n] with the declared overlap, the last chunk reaches n, no chunk
    is contained in its predecessor, and every non-tail chunk is exactly
    WIDTH long."""
    import math

    from duckdb_parquet_parser_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_WIDTH,
    )

    overlap = CHUNK_WIDTH - CHUNK_STRIDE
    for n in range(1, 2001):
        m = max(1, math.ceil((n - overlap) / CHUNK_STRIDE))
        starts = [1 + k * CHUNK_STRIDE for k in range(m)]
        ends = [min(s + CHUNK_WIDTH - 1, n) for s in starts]
        assert starts[0] == 1
        assert ends[-1] == n, n
        for k in range(1, m):
            # no gap: chunk k starts inside (or adjacent to) chunk k-1
            assert starts[k] <= ends[k - 1] + 1, n
            # no containment: predecessor must not already cover the end
            assert ends[k - 1] < n, n
        for k in range(m - 1):
            assert ends[k] - starts[k] + 1 == CHUNK_WIDTH, n


def test_cms_estimates_match_pure_python_reference(spark, sf_smoke):
    """Count-min properties against a fully independent pure-Python
    sketch (hashlib md5, collections.Counter — no Spark, no DuckDB):
    every reported (exact, estimate) pair must equal the reference's,
    estimate >= exact always (collisions only ADD), and with the
    deliberately narrow width at least one word must actually collide
    or the sketch certifies nothing."""
    import hashlib
    from collections import Counter

    from duckdb_parquet_parser_spark.operators.corpus import (
        CMS_DEPTH,
        CMS_WIDTH,
        q_ns_heavy_hitters_cms,
    )

    docs = load_table(spark, sf_smoke, "documents").collect()
    words = [
        w
        for r in docs
        if r["text"] is not None
        for w in r["text"].split(" ")
    ]
    counters = [Counter() for _ in range(CMS_DEPTH)]
    n_digits = 1
    while 16**n_digits < CMS_WIDTH:
        n_digits += 1

    def bucket(i, w):
        hx = hashlib.md5(f"cm{i}:{w}".encode()).hexdigest()
        return int(hx[:n_digits], 16) % CMS_WIDTH

    for w in words:
        for i in range(CMS_DEPTH):
            counters[i][bucket(i, w)] += 1
    exact = Counter(words)

    rows = q_ns_heavy_hitters_cms(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["exact_count"] == exact[r["word"]]
        ref_est = min(
            counters[i][bucket(i, r["word"])] for i in range(CMS_DEPTH)
        )
        assert r["cms_estimate"] == ref_est, r["word"]
        assert r["cms_estimate"] >= r["exact_count"]
        expected = round(
            (r["cms_estimate"] - r["exact_count"]) / r["exact_count"], 6
        )
        assert abs(r["rel_error"] - expected) < 1e-12
    assert any(r["cms_estimate"] > r["exact_count"] for r in rows)


def test_quantile_sketch_matches_pure_python_reference(spark, sf_smoke):
    """Quantile-sketch properties against an independent pure-Python
    reference (sorted list + math.ceil — no Spark, no DuckDB): the
    exact column must equal true order statistics, the sketch estimate
    must equal the reference histogram's bucket upper edge, and the
    estimate can never fall BELOW the exact value (the upper-edge
    estimator one-sidedly overshoots, like CMS's overcount)."""
    import math

    from duckdb_parquet_parser_spark.operators.corpus import (
        QS_BUCKET,
        QS_MAX_BUCKET,
        QS_QUANTILES,
        q_ns_quantile_sketch,
    )

    docs = load_table(spark, sf_smoke, "documents").collect()
    nts = sorted(
        len(r["text"].split(" ")) if r["text"] is not None else 0
        for r in docs
    )
    n = len(nts)
    rows = {r["q"]: r for r in q_ns_quantile_sketch(spark, sf_smoke).collect()}
    assert set(rows) == {float(q) for q in QS_QUANTILES}
    for q in QS_QUANTILES:
        r = rows[float(q)]
        rank = math.ceil(q * n)
        assert r["rank"] == rank
        exact = nts[rank - 1]
        assert r["exact_tokens"] == exact
        b = min(exact // QS_BUCKET, QS_MAX_BUCKET)
        assert r["sketch_tokens"] == (b + 1) * QS_BUCKET - 1
        # one-sided: the upper-edge estimator never undershoots (unless
        # the value landed in the capped top bucket, absent in fixtures)
        assert r["sketch_tokens"] >= exact
        expected = round(
            (r["sketch_tokens"] - exact) / max(exact, 1), 6
        )
        assert abs(r["rel_error"] - expected) < 1e-12
