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
