"""Differential testing on RANDOMIZED embeddings fixtures: the similarity
family (brute-force kNN, IVF/LSH ANN, embedding near-dup, spherical
k-means) re-run against its oracles over generated vector tables with
the cases the fixture lacks — zero-norm vectors (cosine division by
zero), exact-duplicate vectors (ties at similarity 1.0), axis-aligned
and near-identical vectors (rank-tie pressure), and magnitude extremes.
Cross-engine float behavior at these edges (NULL vs NaN vs Inf) is
exactly where a Spark plan and a DuckDB oracle can drift."""

from __future__ import annotations

import os
import random

import pytest

from duckdb_parquet_parser_spark.catalog import TABLES
from duckdb_parquet_parser_spark.testing import run_all

SF_BASE = "/root/testdata/sf0.001"

SIM_QUERIES = [
    "ns_knn_bruteforce",
    "ns_embed_neardup",
    "ns_ann_lsh_buckets",
    "ns_ann_ivf_topk",
    "ns_kmeans_embed",
    # round-12: convergent-CC clusters over the near-dup pair graph —
    # random fixtures produce exact-duplicate CLIQUES (cos 1.0 ties) and
    # chain fragments; the WITH RECURSIVE oracle converges independently
    # of the query's doubling rounds, so this differential actually
    # checks fixpoint-vs-fixpoint on arbitrary graph shapes
    "ns_embed_dedup_cluster",
]

DIM = 64


def _vector(rng: random.Random, kind: str) -> list[float]:
    if kind == "zero":
        return [0.0] * DIM
    if kind == "axis":
        v = [0.0] * DIM
        v[rng.randrange(DIM)] = rng.choice([1.0, -1.0, 1000.0])
        return v
    if kind == "tiny":
        return [rng.uniform(-1e-6, 1e-6) for _ in range(DIM)]
    if kind == "large":
        return [rng.uniform(-1e4, 1e4) for _ in range(DIM)]
    return [rng.gauss(0, 1) for _ in range(DIM)]


def _make_fixture(tmp_path, seed: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = tmp_path / f"randv{seed}"
    sf_dir.mkdir()
    for t in TABLES:
        src = os.path.join(SF_BASE, f"{t}.parquet")
        if t != "embeddings" and os.path.exists(src):
            os.symlink(src, sf_dir / f"{t}.parquet")
    n = 200
    kinds = ["gauss"] * 6 + ["axis", "tiny", "large", "zero"]
    vecs = [_vector(rng, rng.choice(kinds)) for _ in range(n)]
    # planted exact duplicates and near-identical pairs
    for i in range(0, n, 23):
        vecs[(i + 1) % n] = list(vecs[i])
    for i in range(0, n, 37):
        vecs[(i + 2) % n] = [x + 1e-7 for x in vecs[i]]
    arr = np.array(vecs, dtype=np.float32)  # float32 like the fixture
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in arr],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([rng.randrange(8) for _ in range(n)], pa.int32()),
        }
    )
    pq.write_table(table, sf_dir / "embeddings.parquet")
    return str(sf_dir)


@pytest.mark.parametrize("seed", [201, 202])
def test_similarity_queries_match_oracles_on_random_fixtures(
    spark, tmp_path, seed
):
    sf_dir = _make_fixture(tmp_path, seed)
    results = run_all(spark, sf_dir, only=SIM_QUERIES)
    bad = [str(r) for r in results if not r.ok]
    assert not bad, "\n".join(bad)
    assert len(results) == len(SIM_QUERIES)
