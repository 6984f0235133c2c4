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
