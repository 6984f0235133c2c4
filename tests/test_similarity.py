"""Approximate-nearest-neighbor quality: the ANN variants trade recall for
candidate reduction — quantify both against exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.catalog import load_table
from duckdb_parquet_parser_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    ann_lsh_topk,
    q_ns_ann_ivf_topk,
    q_ns_knn_bruteforce,
)


def _topk_sets(df):
    rows = df.select("query_id", "neighbor_id").collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_smoke):
    exact = _topk_sets(q_ns_knn_bruteforce(spark, sf_smoke))
    approx = _topk_sets(q_ns_ann_ivf_topk(spark, sf_smoke))
    assert set(approx) == set(exact) == set(range(N_QUERIES))
    recalls = [
        len(approx[q] & exact[q]) / TOP_K for q in exact
    ]
    # IVF with 2/16 cells probed: require mean recall well above the
    # ~12.5% a random candidate subset of that size would give
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_lsh_topk_runs_and_is_subset_quality(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    approx = ann_lsh_topk(emb, queries)
    got = approx.groupBy("query_id").count().collect()
    # every query that lands in a non-singleton bucket returns ≤ k rows
    assert all(r["count"] <= TOP_K for r in got)


def test_embed_neardup_candidate_recall(spark, sf_smoke):
    """The declared ns_embed_neardup is cluster-then-join (candidates only
    within a shared IVF cell). Quantify its recall against the all-pairs
    baseline — on THIS corpus the vectors are near-random and the 0.3
    threshold sits at θ≈72°, the provably LSH-hard regime, so recall is
    moderate; the differential oracle replicates the same candidate set, so
    correctness is exact regardless."""
    from duckdb_parquet_parser_spark.operators.similarity import (
        embed_neardup_allpairs,
        q_ns_embed_neardup,
    )

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embed_neardup_allpairs(spark, sf_smoke).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in q_ns_embed_neardup(spark, sf_smoke).collect()
    }
    assert approx <= exact  # candidates are verified exactly — no false positives
    assert len(approx) / len(exact) >= 0.35, (len(approx), len(exact))


def test_embed_neardup_plan_has_no_full_crossjoin(spark, sf_smoke):
    """Only the broadcast centroid table (N_CELLS rows) may appear on a
    nested-loop join; the candidate join must be an equi-join on the cell."""
    from duckdb_parquet_parser_spark.operators.similarity import q_ns_embed_neardup

    plan = (
        q_ns_embed_neardup(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan



def test_pair_dot_null_vector_yields_null_not_nan(spark):
    """A NULL embedding must produce a NULL dot (→ NULL cosine, filtered
    by any threshold), NOT NaN — Spark orders NaN ABOVE every numeric, so
    a NaN cosine would PASS a >= threshold and emit the pair
    (code-review r5)."""
    from pyspark.sql import types as T

    from duckdb_parquet_parser_spark.operators.similarity import (
        _pair_dot_impl,
    )

    pair_dot = F.pandas_udf(_pair_dot_impl, T.DoubleType())
    schema = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.FloatType()), True),
            T.StructField("b", T.ArrayType(T.FloatType()), True),
        ]
    )
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0]), (None, [3.0, 4.0]), ([1.0, 2.0], None)],
        schema,
    ).select(pair_dot("a", "b").alias("d"))
    rows = df.collect()
    assert rows[0]["d"] == 11.0
    assert rows[1]["d"] is None and rows[2]["d"] is None
    # and a NULL never survives a >= filter (the near-dup emission path)
    assert df.filter(F.col("d") >= -1e9).count() == 1


def test_verify_cell_kernel_matches_bruteforce_reference():
    """_verify_cell_impl (pair gen + bitmask exactly-once rule + bit-exact
    cosine) against a naive pure-Python reference over a synthetic cell:
    unsorted ids, a null embedding, a zero vector, and probe lists that
    make the smallest-shared-cell rule both keep and drop pairs."""
    import numpy as np
    import pandas as pd

    from duckdb_parquet_parser_spark.operators.similarity import (
        NEARDUP_COS,
        _verify_cell_impl,
    )

    rng = np.random.default_rng(7)
    n = 40
    cell = 3
    ids = rng.permutation(np.arange(100, 100 + n)).astype("int64")
    embs = [rng.normal(size=8).astype(np.float32) for _ in range(n)]
    embs[5] = None  # null embedding: never emits
    embs[7] = np.zeros(8, dtype=np.float32)  # zero norm: cosine 0.0
    # half the rows also probe cell 1 (< cell) or cell 9 (> cell)
    cells = []
    for k in range(n):
        other = 1 if k % 4 == 0 else (9 if k % 4 == 1 else 5)
        cells.append([cell, other])
    nrm = [
        float(np.sqrt(np.sum(np.asarray(e, dtype=np.float64) ** 2)))
        if e is not None
        else None
        for e in embs
    ]
    pdf = pd.DataFrame(
        {
            "cell": [cell] * n,
            "vec_id": ids,
            "embedding": embs,
            "nrm": nrm,
            "cells": cells,
        }
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in _verify_cell_impl(pdf).itertuples(index=False)
    }

    # naive reference
    want = set()
    order = np.argsort(ids)
    for a in range(n):
        for b in range(n):
            ia, ib = order[a], order[b]
            if ids[ia] >= ids[ib]:
                continue
            if embs[ia] is None or embs[ib] is None:
                continue
            shared = sorted(set(cells[ia]) & set(cells[ib]))
            if not shared or shared[0] != cell:
                continue
            x = np.asarray(embs[ia], dtype=np.float64)
            y = np.asarray(embs[ib], dtype=np.float64)
            dot = 0.0
            for d in range(8):
                dot = dot + x[d] * y[d]
            denom = nrm[ia] * nrm[ib]
            cos = 0.0 if denom == 0 else dot / denom
            if cos >= NEARDUP_COS:
                want.add((ids[ia], ids[ib]))
    assert got == want
    assert len(want) > 0  # the fixture must actually emit pairs


def test_verify_cell_kernel_slab_path_identical(monkeypatch):
    """Forcing a tiny slab size must not change the emitted pair set —
    the memory-bounding loop is pure mechanics."""
    import numpy as np
    import pandas as pd

    from duckdb_parquet_parser_spark.operators import similarity

    rng = np.random.default_rng(11)
    n = 30
    embs = [rng.normal(size=6).astype(np.float32) for _ in range(n)]
    pdf = pd.DataFrame(
        {
            "cell": [0] * n,
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": embs,
            "nrm": [
                float(np.sqrt(np.sum(np.asarray(e, dtype=np.float64) ** 2)))
                for e in embs
            ],
            "cells": [[0]] * n,
        }
    )
    big = {
        (r.vec_a, r.vec_b)
        for r in similarity._verify_cell_impl(pdf).itertuples(index=False)
    }
    monkeypatch.setattr(similarity, "VERIFY_SLAB_PAIRS", 7)
    small = {
        (r.vec_a, r.vec_b)
        for r in similarity._verify_cell_impl(pdf).itertuples(index=False)
    }
    assert big == small and len(big) > 0
