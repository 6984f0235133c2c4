"""Skew-salted LSH candidate generation: exact set-equality with the
plain bucket join, and block-level balance of the salted key space."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.operators.dedup import (
    N_SALT_BLOCKS,
    _doc_word_arrays,
    lsh_candidate_pairs,
    lsh_candidate_pairs_salted,
    minhash_signatures_from_arrays,
)


def test_salted_pairs_equal_plain_pairs(spark, sf_smoke):
    sigs = minhash_signatures_from_arrays(_doc_word_arrays(spark, sf_smoke))
    plain = lsh_candidate_pairs(sigs)
    salted = lsh_candidate_pairs_salted(sigs)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salting_splits_hot_bucket_keys(spark, sf_smoke):
    """The join key space of the salted plan carries n_blocks distinct
    target blocks, so a hot bucket's pairs spread over ~n_blocks reducers
    instead of one."""
    sigs = minhash_signatures_from_arrays(_doc_word_arrays(spark, sf_smoke))
    bands_cols = [f"h{i}" for i in range(4)]
    banded = sigs.select(
        "doc_id", F.md5(F.concat_ws("|", *bands_cols)).alias("band_hash")
    ).withColumn("block", F.pmod(F.xxhash64("doc_id"), F.lit(N_SALT_BLOCKS)))
    hot = (
        banded.groupBy("band_hash")
        .count()
        .orderBy(F.desc("count"))
        .first()["band_hash"]
    )
    blocks = (
        banded.filter(F.col("band_hash") == hot)
        .select("block")
        .distinct()
        .count()
    )
    assert blocks > 1  # the hot bucket's rows span multiple salt blocks


def test_connected_components_rounds_reach_fixpoint(spark, sf_smoke):
    """CC_ROUNDS doubling rounds must be AT the fixpoint on the fixtures
    (one extra round changes nothing) — the guard for the fixed-round
    design: if the duplicate-graph shape ever needs more rounds, this
    fails instead of silently mislabeling components. The sf0.1 sweep
    checks the same property at 10x scale (fixpoint observed at exactly
    4 rounds there; see dedup.CC_ROUNDS)."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        CC_ROUNDS,
        connected_components,
        q_ns_dedup_simhash_pairs,
    )

    pairs = (
        q_ns_dedup_simhash_pairs(spark, sf_smoke)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    at = connected_components(pairs, rounds=CC_ROUNDS)
    past = connected_components(pairs, rounds=CC_ROUNDS + 1).withColumnRenamed(
        "component", "component2"
    )
    diff = (
        at.join(past, "doc")
        .filter(F.col("component") != F.col("component2"))
        .count()
    )
    assert diff == 0
    # and the self-loop propagation covers isolated-from-min nodes: every
    # node keeps a label ≤ its own id
    assert at.filter(F.col("component") > F.col("doc")).count() == 0
