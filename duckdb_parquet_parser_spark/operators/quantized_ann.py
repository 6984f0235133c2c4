"""Int8-quantized embedding search — the memory/shuffle scale path for
similarity at 100 TB (library + test surface, like ``ann_lsh_topk``'s
recall harness; no driver query — the certified ANN queries stay on the
exact/IVF paths whose oracles are cross-engine deterministic, while
quantized scoring is by construction an APPROXIMATION whose value is
measured as recall against the exact baseline, not as SQL parity).

Why this exists: a 64-dim float32 embedding is 256 bytes; its symmetric
int8 quantization is 64 bytes + one float scale — a 4× reduction in
scan, shuffle and broadcast volume for every candidate-generation stage
(IVF cell joins, brute-force sweeps over cells). The standard
production layout is quantized vectors for CANDIDATE SCORING and the
float vectors only for the final re-rank of the top candidates — this
module provides both legs and the recall harness that justifies them
(tests/test_quantized_ann.py pins recall@k vs the exact float top-k).

Everything is JVM-side array arithmetic (transform / zip_with /
aggregate) — no Python in the scoring loop, same discipline as
similarity.py. Quantization: per-vector symmetric max-abs scaling,
``q_i = round(x_i * 127 / max|x|)`` (zero vectors quantize to zeros
with scale 0 — the dot guard treats them as cosine 0, matching
``safe_cosine``). Integer dot products accumulate in LONG (64 · 127²
≪ 2⁶³): exact, overflow-free, platform-independent.

Reference analog: none — SURVEY.md §2.5 similarity-search scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, scale_out
from .similarity import N_QUERIES, TOP_K

Q_LEVELS = 127  # symmetric int8 grid


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``qvec`` (array<int> in [-127, 127]) and ``q_scale`` (the
    DEQUANTIZATION step, max|x|/127 — multiply to recover floats; 0.0
    for the all-zero vector). One pass, zero shuffle."""
    max_abs = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x))
    ).cast("double")
    scale = F.when(max_abs > 0, F.lit(float(Q_LEVELS)) / max_abs).otherwise(
        F.lit(0.0)
    )
    return df.withColumn(
        "qvec",
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("int"),
        ),
    ).withColumn(
        "q_scale",
        F.when(max_abs > 0, max_abs / F.lit(float(Q_LEVELS))).otherwise(
            F.lit(0.0)
        ),
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int arrays, accumulated in LONG."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _int_norm2(a: Column) -> Column:
    return _int_dot(a, a)


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine on the quantized grid: the per-vector scales cancel in the
    ratio, so this needs ONLY the int8 arrays — the float vectors never
    enter the candidate-scoring stage. Zero vectors score 0."""
    na2 = _int_norm2(qa).cast("double")
    nb2 = _int_norm2(qb).cast("double")
    return F.when(
        (na2 > 0) & (nb2 > 0),
        _int_dot(qa, qb).cast("double") / (F.sqrt(na2) * F.sqrt(nb2)),
    ).otherwise(F.lit(0.0))


def knn_bruteforce_quantized(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """The exact-bruteforce KNN shape scored on int8 vectors: per query
    vector (vec_id < N_QUERIES), the top-k neighbors by QUANTIZED
    cosine. Same plan skeleton as the certified ``ns_knn_bruteforce``
    (broadcast queries, one scoring pass, TopK window) — only the
    scoring payload shrinks 4×. Recall vs the float top-k is the
    quality metric (tests pin it); production re-ranks these candidates
    with the float vectors."""
    emb = quantize_int8(
        scale_out(spark, load_table(spark, sf_dir, "embeddings"))
    ).select("vec_id", "qvec")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    scored = (
        emb.withColumnRenamed("vec_id", "neighbor_id")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "qcos", quantized_cosine(F.col("q_qvec"), F.col("qvec"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qcos")
    )
