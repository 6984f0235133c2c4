"""The quality-logit SQL single-source invariant (consolidated round 16;
until then this file was a drift TRIPWIRE over three independent
spellings — curation._LOGIT_SQL, ngram_stats.ORACLES['ns_quality_logit'],
and dedup's canonical-selection scored CTE). Now every certified oracle
interpolates ``ngram_stats.LOGIT_SQL``; this test pins (a) that the
interpolations are literal — the fragment appears verbatim in each
consumer, so a future re-spelling can't silently reintroduce the
triple-copy hazard — and (b) that the assembled SQL still evaluates to
bit-identical per-doc logits in DuckDB (the consolidation must preserve
behavior, not just structure)."""

from __future__ import annotations

import re

import duckdb


def _docs_view(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )


def test_logit_sql_single_source():
    """Structural pin: one fragment, interpolated verbatim everywhere."""
    from duckdb_parquet_parser_spark.operators.curation import (
        _LOGIT_SQL,
        ORACLES as CUR_ORACLES,
    )
    from duckdb_parquet_parser_spark.operators.dedup import (
        ORACLES as DEDUP_ORACLES,
    )
    from duckdb_parquet_parser_spark.operators.ngram_stats import (
        LOGIT_SQL,
        ORACLES as NGRAM_ORACLES,
    )

    assert _LOGIT_SQL is LOGIT_SQL  # re-export, not a copy
    assert LOGIT_SQL in NGRAM_ORACLES["ns_quality_logit"]
    assert LOGIT_SQL in DEDUP_ORACLES["ns_dedup_cluster_canonical"]
    assert LOGIT_SQL in CUR_ORACLES["ns_source_cap"]


def test_assembled_logit_spellings_agree(sf_smoke):
    """Behavioral pin: the assembled oracles produce bit-identical
    per-doc logits (the consolidation preserved the certified text —
    the r15 ns_quality_logit oracle string is reproduced byte-for-byte
    from the fragment)."""
    from duckdb_parquet_parser_spark.operators.dedup import (
        ORACLES as DEDUP_ORACLES,
    )
    from duckdb_parquet_parser_spark.operators.ngram_stats import (
        LOGIT_SQL,
        ORACLES as NGRAM_ORACLES,
    )

    con = duckdb.connect()
    _docs_view(con, sf_smoke)

    base = dict(
        con.execute(
            f"SELECT doc_id, CAST({LOGIT_SQL} AS BIGINT) FROM documents "
            "WHERE text IS NOT NULL"
        ).fetchall()
    )
    assert base

    via_ngram = dict(
        con.execute(
            f"SELECT doc_id, logit_micro FROM ("
            f"{NGRAM_ORACLES['ns_quality_logit']})"
        ).fetchall()
    )
    assert via_ngram == base

    canonical_sql = DEDUP_ORACLES["ns_dedup_cluster_canonical"]
    m = re.search(
        r"scored AS \(\s*(SELECT .*?FROM documents WHERE text IS NOT NULL)",
        canonical_sql,
        re.S,
    )
    assert m, "scored CTE not found — spelling moved; update this test"
    via_dedup = dict(con.execute(m.group(1)).fetchall())
    assert via_dedup == base
    con.close()
