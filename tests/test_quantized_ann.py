"""Int8-quantized similarity (operators/quantized_ann.py): quantization
round-trip error bounds, degenerate-vector guards, and the recall@k
harness against the exact float brute force — the evidence that the 4×
smaller candidate-scoring payload is usable at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.operators.quantized_ann import (
    Q_LEVELS,
    knn_bruteforce_quantized,
    quantize_int8,
)
from duckdb_parquet_parser_spark.operators.similarity import (
    TOP_K,
    q_ns_knn_bruteforce,
)


def test_quantization_roundtrip_error_bound(spark, sf_smoke):
    """Per component: |x - q * q_scale| ≤ q_scale / 2 (round-to-nearest
    on the max-abs grid), q ∈ [-127, 127], and the max-abs component
    quantizes to exactly ±127."""
    from duckdb_parquet_parser_spark.catalog import load_table

    q = quantize_int8(load_table(spark, sf_smoke, "embeddings"))
    checks = q.select(
        F.array_max(
            F.zip_with(
                "embedding",
                "qvec",
                lambda x, v: F.abs(
                    x.cast("double") - v.cast("double") * F.col("q_scale")
                ),
            )
        ).alias("max_err"),
        F.col("q_scale"),
        F.array_max(F.transform("qvec", lambda v: F.abs(v))).alias("max_q"),
    ).collect()
    assert checks
    for r in checks:
        assert r["max_q"] <= Q_LEVELS
        if r["q_scale"] > 0:
            assert r["max_err"] <= r["q_scale"] / 2 + 1e-12, r
            assert r["max_q"] == Q_LEVELS, r  # max-abs hits the grid edge


def test_zero_vector_quantizes_to_zeros(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, -2.0, 0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[0]["qvec"] == [0, 0, 0, 0] and rows[0]["q_scale"] == 0.0
    assert rows[1]["qvec"][1] == -Q_LEVELS  # max-abs component
    assert rows[1]["q_scale"] == pytest.approx(2.0 / Q_LEVELS)


def test_quantized_knn_recall_vs_exact(spark, sf_smoke):
    """Recall@k of the int8-scored top-k against the exact float top-k.
    64-dim vectors quantized to 127 levels lose ~0.4% per-component
    precision; the near-random fixture embeddings have tightly packed
    cosines (the hard case for quantized ranking), so the bar is a
    floor, not a target — production re-ranks candidates with floats."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ns_knn_bruteforce(spark, sf_smoke).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce_quantized(spark, sf_smoke).collect()
    }
    assert len(exact) == len(quant)
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall
    # and with a 2k candidate budget re-ranked exactly, recall@k -> ~1:
    # the production shape (quantized candidates, float re-rank)
    cand2k = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce_quantized(
            spark, sf_smoke, k=2 * TOP_K
        ).collect()
    }
    assert len(exact - cand2k) / len(exact) <= 0.05, (
        "2k quantized candidates no longer cover the exact top-k"
    )
