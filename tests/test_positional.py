"""Positional stream & chunk index: file-order assumption, exact greedy
boundary parity with a pure-Python re-statement of the reference rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.catalog import load_table
from duckdb_parquet_parser_spark.operators.positional import (
    CHUNK_SIZE,
    byte_cost,
    file_order_positions,
    greedy_chunk_ids_pandas,
    scalable_chunk_ids,
    with_chunk_ids,
)


def _cost(v: str) -> int:
    """ASCII-decimal length prefix + payload (main.cpp:30)."""
    return len(str(len(v))) + len(v)


def test_file_order_is_doc_id_order(spark, sf_smoke):
    """Pins the oracle assumption of r10_file_order: the fixture writes
    documents in doc_id order, so zipWithIndex positions == doc_id."""
    df = load_table(spark, sf_smoke, "documents")
    fo = file_order_positions(df.select("doc_id"))
    assert fo.filter(F.col("pos") != F.col("doc_id")).count() == 0


def _reference_greedy(values: list[str], chunk_size: int) -> list[int]:
    """main.cpp:21-32 restated: check-before-append, overshoot ≤ 1 value."""
    out, chunk_id, current = [], 0, 0
    for v in values:
        if current >= chunk_size:
            chunk_id += 1
            current = 0
        out.append(chunk_id)
        current += _cost(v)
    return out


def test_greedy_chunker_matches_sequential_reference(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "documents")
    got = {
        r["pos"]: r["chunk_id"]
        for r in greedy_chunk_ids_pandas(df).collect()
    }
    texts = [
        r["text"]
        for r in df.orderBy("doc_id").select("text").collect()
        if r["text"] is not None
    ]
    want = _reference_greedy(texts, CHUNK_SIZE)
    assert [got[p] for p in sorted(got)] == want


def test_greedy_chunks_overshoot_at_most_one_value(spark, sf_smoke):
    """The reference's boundary rule: every chunk except the last reaches
    ≥ CHUNK_SIZE bytes, and removing its final value drops it below."""
    df = load_table(spark, sf_smoke, "documents")
    chunks = (
        greedy_chunk_ids_pandas(df)
        .join(
            file_order_positions(df)
            .filter(F.col("text").isNotNull())
            .select("pos", byte_cost(F.col("text")).alias("cost")),
            "pos",
        )
        .groupBy("chunk_id")
        .agg(
            F.sum("cost").alias("bytes"),
            F.max("cost").alias("max_cost"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    last = max(r["chunk_id"] for r in chunks)
    for r in chunks:
        if r["chunk_id"] == last:
            continue
        assert r["bytes"] >= CHUNK_SIZE


def test_scalable_chunk_ids_match_window_formula(spark, sf_smoke):
    """The shuffle-free two-pass prefix-sum variant assigns exactly the
    same (pos, chunk_id) map as the global-window formula (fixture file
    order == doc_id order, pinned above)."""
    df = load_table(spark, sf_smoke, "documents")
    want = {
        (r["pos"], r["chunk_id"])
        for r in with_chunk_ids(df).select("pos", "chunk_id").collect()
    }
    got = {
        (r["pos"], r["chunk_id"])
        for r in scalable_chunk_ids(df).collect()
    }
    assert got == want


def test_formula_and_greedy_agree_on_chunk_count_scale(spark, sf_smoke):
    """The closed-form window formula is the scalable approximation; its
    chunk count stays within one of the exact greedy rule on the fixture."""
    df = load_table(spark, sf_smoke, "documents")
    n_formula = with_chunk_ids(df).agg(F.max("chunk_id")).collect()[0][0]
    n_greedy = (
        greedy_chunk_ids_pandas(df).agg(F.max("chunk_id")).collect()[0][0]
    )
    assert abs(n_formula - n_greedy) <= max(2, n_greedy // 10)
