"""Staged round-16 fixes (operators/staged_r16_fixes.py): the hinted
minhash verify join and the persisted-components droprate — both must be
result-identical to their certified originals (same DuckDB oracles,
imported verbatim) and carry the plan/contract properties that motivate
the r16 swap."""

from __future__ import annotations

import pytest

from duckdb_parquet_parser_spark.operators.staged_r16_fixes import (
    ORACLES_STAGED_R16,
    QUERIES_STAGED_R16,
    q_ns_dedup_minhash_hashjoin,
    q_ns_source_droprate_persisted,
    read_components_artifact,
    write_components_artifact,
)
from duckdb_parquet_parser_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES_STAGED_R16))
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_staged_r16_matches_certified_oracle(spark, name, sf_dir):
    res = compare_query(
        spark, sf_dir, name, QUERIES_STAGED_R16[name], ORACLES_STAGED_R16[name]
    )
    assert res.ok, res


def test_hashjoin_verify_equals_certified_rows(spark, sf_smoke):
    """Spark-vs-Spark: the hinted verify and the certified verify return
    the same pair set (the hint changes strategy, never semantics)."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        q_ns_dedup_minhash,
    )

    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in q_ns_dedup_minhash_hashjoin(spark, sf_smoke).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in q_ns_dedup_minhash(spark, sf_smoke).collect()
    }
    assert got == want and want


def test_hashjoin_verify_never_sorts_the_pair_stream(spark, sf_smoke):
    """The motivating lock (BENCH_NOTES r15 sf1 A/B): with broadcast
    DISABLED — the regime a big doc-array relation forces — BOTH verify
    joins run as ShuffledHashJoin in the hinted plan (exactly two fewer
    SortMergeJoins than the certified plan, which demotes both verify
    joins to SMJ and sorts the candidate-pair stream). The band-bucket
    self-join inside lsh_candidate_pairs may still SMJ in this forced
    regime — it sorts the 4-rows/doc banded SIGNATURE table, not the
    pair stream, and is out of this fix's scope."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        q_ns_dedup_minhash,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = (
            q_ns_dedup_minhash_hashjoin(spark, sf_smoke)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        certified = (
            q_ns_dedup_minhash(spark, sf_smoke)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert hinted.count("ShuffledHashJoin") >= 2
    # the defect being fixed is real in the same regime: exactly the
    # two verify joins demote to SMJ without the hint
    assert (
        certified.count("SortMergeJoin")
        == hinted.count("SortMergeJoin") + 2
    )


def test_hashjoin_verify_keeps_broadcast_at_fixture_scale(spark, sf_smoke):
    """The conditionality lock: with the default threshold the doc-array
    side broadcasts, so the staged plan must be hint-FREE — an
    unconditional hint measurably regressed the fixture row (4.6 →
    7.2 s steady at sf0.1, BENCH_NOTES r15) because join hints outrank
    the size-based broadcast choice."""
    plan = (
        q_ns_dedup_minhash_hashjoin(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_droprate_persisted_artifact_contract(spark, sf_smoke, tmp_path):
    """The cross-run contract: a second run reuses the artifact (no
    rewrite), results equal the certified in-session row, and a
    version-bumped sidecar is rejected BEFORE any data read."""
    import json
    import os

    from duckdb_parquet_parser_spark.operators.curation import (
        q_ns_source_droprate,
    )
    from duckdb_parquet_parser_spark.operators.staged_r16_fixes import (
        _comp_artifact_path,
    )

    got = {
        tuple(r) for r in q_ns_source_droprate_persisted(spark, sf_smoke).collect()
    }
    want = {tuple(r) for r in q_ns_source_droprate(spark, sf_smoke).collect()}
    assert got == want and want

    # artifact reused on the second run: meta mtime unchanged
    art = _comp_artifact_path(sf_smoke)
    meta = os.path.join(art, "_sig_meta.json")
    m0 = os.stat(meta).st_mtime_ns
    again = {
        tuple(r) for r in q_ns_source_droprate_persisted(spark, sf_smoke).collect()
    }
    assert again == want
    assert os.stat(meta).st_mtime_ns == m0

    # stale version → loud rejection before data (rewrite the sidecar
    # through the Hadoop path — a raw pathlib write would trip the
    # LocalFileSystem's .crc checksum instead of the version check)
    from duckdb_parquet_parser_spark.operators.dedup import (
        _artifact_meta_path,
        _fs_move_text_into_place,
    )

    bad = tmp_path / "comp_art"
    write_components_artifact(spark, sf_smoke, f"file://{bad}")
    _fs_move_text_into_place(
        spark,
        _artifact_meta_path(f"file://{bad}"),
        json.dumps({"comp_version": 999}),
    )
    with pytest.raises(ValueError, match="version"):
        read_components_artifact(spark, f"file://{bad}")


@pytest.mark.parametrize("seed", [414, 7381])
def test_staged_r16_fixes_on_random_docs(spark, tmp_path, seed):
    """Randomized docs pressure on both staged queries: unicode grams,
    null texts, adversarial duplicate graphs.

    The hashjoin minhash checks against its DuckDB oracle (exact on any
    fixture — the docs family sweeps the certified minhash the same
    way). The persisted droprate checks SPARK-vs-SPARK against the
    certified row instead: its claim is persisted ≡ recomputed, and the
    unrolled-CC droprate ORACLE is documented as valid only on
    driver-fixture graphs (random duplicate graphs can under-converge
    the 4-round unrolled SQL chain — the seed-22/r13 find; the
    certified droprate is excluded from random oracle sweeps for the
    same reason, dedup.py q_ns_dedup_components docstring)."""
    import test_randomized_docs as docs

    from duckdb_parquet_parser_spark.operators.curation import (
        q_ns_source_droprate,
    )

    sf_dir = docs._make_fixture(tmp_path, seed)
    res = compare_query(
        spark,
        sf_dir,
        "ns_dedup_minhash_hashjoin",
        QUERIES_STAGED_R16["ns_dedup_minhash_hashjoin"],
        ORACLES_STAGED_R16["ns_dedup_minhash_hashjoin"],
    )
    assert res.ok, res
    got = {
        tuple(r)
        for r in q_ns_source_droprate_persisted(spark, sf_dir).collect()
    }
    want = {tuple(r) for r in q_ns_source_droprate(spark, sf_dir).collect()}
    assert got == want and want
