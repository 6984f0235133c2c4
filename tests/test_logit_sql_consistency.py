"""Drift tripwire for the quality-logit SQL until the r16 consolidation
lands (REVIEW_r14 #3 / VERDICT r14 "What's wrong" #3): the logit
expression is spelled in three certified oracle strings —
curation._LOGIT_SQL (the assembled fragment), ngram_stats.ORACLES
['ns_quality_logit'], and dedup.ORACLES['ns_dedup_cluster_canonical']'s
scored CTE. Until they become one source, any edit that changes ONE
spelling silently desynchronizes quality ordering across certified
queries. This test runs all three spellings through DuckDB on the same
fixture and asserts bit-identical per-doc logits — it trips the moment
the spellings diverge, converting the scheduled consolidation from
"remember to do it right" into a guarded invariant."""

from __future__ import annotations

import re

import duckdb


def _docs_view(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )


def test_three_logit_spellings_agree(sf_smoke):
    from duckdb_parquet_parser_spark.operators.curation import _LOGIT_SQL
    from duckdb_parquet_parser_spark.operators.dedup import (
        ORACLES as DEDUP_ORACLES,
    )
    from duckdb_parquet_parser_spark.operators.ngram_stats import (
        ORACLES as NGRAM_ORACLES,
    )

    con = duckdb.connect()
    _docs_view(con, sf_smoke)

    base = dict(
        con.execute(
            f"SELECT doc_id, CAST({_LOGIT_SQL} AS BIGINT) FROM documents "
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

    # the canonical oracle embeds the spelling inside a larger CTE
    # chain; extract its scored CTE's expression by running just that
    # SELECT (the regex pins the exact text so a rewrite that changes
    # the shape also trips here, prompting a test update alongside)
    canonical_sql = DEDUP_ORACLES["ns_dedup_cluster_canonical"]
    m = re.search(
        r"scored AS \(\s*(SELECT .*?FROM documents WHERE text IS NOT NULL)",
        canonical_sql,
        re.S,
    )
    assert m, "scored CTE not found — spelling moved; update this tripwire"
    via_dedup = dict(con.execute(m.group(1)).fetchall())
    assert via_dedup == base
    con.close()
