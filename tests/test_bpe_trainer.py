"""Distributed BPE merge-loop trainer (operators/bpe_trainer.py, staged
r15) vs an INDEPENDENT pure-Python reference trainer.

The merge loop is iterative with per-iteration driver argmax decisions —
the documented non-SQL-expressible class — so its differential is this
reference implementation, not a DuckDB oracle: both trainers must learn
the IDENTICAL merge table (rank, pair, merged token, count at merge
time) and end at the IDENTICAL symbol vocabulary, at two fixture SFs and
under randomized-docs unicode pressure."""

from __future__ import annotations

from collections import Counter

import pytest

from duckdb_parquet_parser_spark.operators.bpe_trainer import (
    BPE_MERGES,
    q_ns_bpe_merges,
    train_bpe,
)


def _ref_word_counts(spark, sf_dir: str) -> Counter:
    """Word frequencies via a path independent of the Spark trainer's
    split/explode plan: collect raw text, split in Python."""
    from duckdb_parquet_parser_spark.catalog import load_table

    wc: Counter = Counter()
    for (text,) in (
        load_table(spark, sf_dir, "documents").select("text").collect()
    ):
        if text is None:
            continue
        for w in text.split(" "):
            if w:
                wc[w] += 1
    return wc


def _ref_bpe(word_counts: Counter, merges: int):
    """Reference BPE trainer (Sennrich et al. 2016), dict-based. Same
    determinism contract as the Spark loop: argmax by (count DESC,
    left ASC, right ASC); greedy left-to-right non-overlapping merge
    application; stop when no pair remains."""
    wc = {tuple(w): c for w, c in word_counts.items()}
    rules = []
    for it in range(1, merges + 1):
        pc: Counter = Counter()
        for syms, c in wc.items():
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] += c
        if not pc:
            break
        (left, right), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((it, left, right, left + right, n))
        nxt: dict = {}
        for syms, c in wc.items():
            out: list = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        wc = nxt
    return rules, wc


def _assert_trainer_matches(spark, sf_dir: str) -> None:
    rules, final_wc = train_bpe(spark, sf_dir)
    try:
        got_vocab = {
            r["s"]
            for r in final_wc.selectExpr("explode(syms) AS s")
            .distinct()
            .collect()
        }
        got_words = {
            (r["w"], r["freq"], tuple(r["syms"]))
            for r in final_wc.collect()
        }
    finally:
        final_wc.unpersist()

    ref_rules, ref_wc = _ref_bpe(_ref_word_counts(spark, sf_dir), BPE_MERGES)
    assert rules == ref_rules
    # the fixture must actually drive a full training run
    assert len(rules) == BPE_MERGES
    # final state: same symbol vocabulary AND same per-word segmentation
    ref_vocab = {s for syms in ref_wc for s in syms}
    assert got_vocab == ref_vocab
    ref_words = {
        ("".join(syms), c, syms) for syms, c in ref_wc.items()
    }
    assert got_words == ref_words


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_bpe_merges_match_reference_trainer(spark, sf):
    _assert_trainer_matches(spark, sf)


def test_bpe_merges_query_shape(spark, sf_smoke):
    """The staged query's contract: dense ranks, token = left+right,
    counts non-increasing (equal counts tie-break on pair ASC)."""
    rows = q_ns_bpe_merges(spark, sf_smoke).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["token"] == r["left"] + r["right"] for r in rows)
    # counts can RISE after a merge creates a new frequent pair, so the
    # only global monotonicity pin is per-iteration determinism — but a
    # rank-1 rule must carry the corpus argmax of raw character pairs
    from duckdb_parquet_parser_spark.operators.pending_r16 import (
        q_ns_bpe_pair_counts,
    )

    top_pair = (
        q_ns_bpe_pair_counts(spark, sf_smoke)
        .filter("rank = 1")
        .collect()[0]
    )
    assert rows[0]["token"] == top_pair["pair"]
    assert rows[0]["n"] == top_pair["n"]


def test_bpe_greedy_merge_application_edge_cases(spark):
    """The fold's greedy non-overlap on the classic traps: 'aaa' under
    (a,a) → [aa, a]; interleaved 'abab' under (b,a) → [a, ba, b]."""
    from pyspark.sql import functions as F

    from duckdb_parquet_parser_spark.operators.bpe_trainer import (
        _apply_merge,
    )

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],)], ["syms"]
    )
    out = df.select(
        _apply_merge(F.col("syms"), "a", "a").alias("aa"),
        _apply_merge(F.col("syms"), "b", "a").alias("ba"),
    ).collect()
    assert out[0]["aa"] == ["aa", "a"]
    assert out[1]["ba"] == ["a", "ba", "b"]


@pytest.mark.parametrize("seed", [313, 6271])
def test_bpe_trainer_on_random_docs(spark, tmp_path, seed):
    """Unicode + empty-token + null-text pressure from the randomized
    docs family — code-point symbol granularity must agree between the
    Catalyst fold and Python iteration on every seed."""
    import test_randomized_docs as docs

    sf_dir = docs._make_fixture(tmp_path, seed)
    rules, final_wc = train_bpe(spark, sf_dir, merges=12)
    try:
        got_words = {
            (r["w"], r["freq"], tuple(r["syms"]))
            for r in final_wc.collect()
        }
    finally:
        final_wc.unpersist()
    ref_rules, ref_wc = _ref_bpe(_ref_word_counts(spark, sf_dir), 12)
    assert rules == ref_rules
    assert got_words == {
        ("".join(syms), c, syms) for syms, c in ref_wc.items()
    }


def test_bpe_tokenize_matches_reference(spark, sf_smoke):
    """Corpus tokenization with the learned merges: per-doc word and
    BPE-token counts must equal the Python reference trainer's
    segmentation applied to the same raw text."""
    from duckdb_parquet_parser_spark.catalog import load_table
    from duckdb_parquet_parser_spark.operators.bpe_trainer import (
        q_ns_bpe_tokenize,
    )

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in q_ns_bpe_tokenize(spark, sf_smoke).collect()
    }
    _, ref_wc = _ref_bpe(_ref_word_counts(spark, sf_smoke), BPE_MERGES)
    tok_len = {"".join(syms): len(syms) for syms in ref_wc}
    want = {}
    for doc_id, text in (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        if text is None:
            continue
        words = [w for w in text.split(" ") if w]
        if words:
            want[doc_id] = (
                len(words),
                sum(tok_len[w] for w in words),
            )
    assert got == want
    # a word is at least one token, so tokens ≥ words per doc
    for doc_id, (nw, nt) in got.items():
        assert nw <= nt


def test_bpe_tokenize_words_on_foreign_corpus(spark):
    """tokenize_words applies a merge table to words the trainer never
    saw — rules fire partially, unknown characters pass through."""
    from duckdb_parquet_parser_spark.operators.bpe_trainer import (
        tokenize_words,
    )

    rules = [(1, "a", "b", "ab", 9), (2, "ab", "c", "abc", 5)]
    df = spark.createDataFrame([("abcab",), ("zzz",), ("cba",)], ["w"])
    got = {r["w"]: r["toks"] for r in tokenize_words(df, rules).collect()}
    assert got["abcab"] == ["abc", "ab"]
    assert got["zzz"] == ["z", "z", "z"]
    assert got["cba"] == ["c", "b", "a"]


def test_bpe_trainer_job_budget(spark, sf_smoke):
    """Driver-round-trip budget (REVIEW_r15 #3 made structural): each of
    the K iterations schedules the argmax (AQE materializes the pair
    aggregation's exchange as its own job, then the take — 2 jobs) +
    ONE eager localCheckpoint, plus the initial word-table checkpoint —
    3·K + small constant (measured 75 at K=24). Guards against a
    regression quietly adding per-iteration jobs (e.g. an uncached
    re-derive of the word table), which at K=30k production scale would
    multiply driver round-trips."""
    sc = spark.sparkContext
    group = "bpe-job-budget"
    sc.setJobGroup(group, "count bpe trainer jobs", False)
    try:
        rules, wc = train_bpe(spark, sf_smoke)
        wc.unpersist()
    finally:
        sc.setJobGroup(None, None, False)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert rules and jobs <= 3 * BPE_MERGES + 4, jobs


def test_bpe_merges_curated_matches_reference(spark, sf_smoke):
    """The curated-corpus composition: the merge table learned from
    quality-KEPT docs only must equal the reference trainer run on the
    Python replica of the same integer-exact gate — and must DIFFER
    from the raw-corpus table (the fixture's junk docs must actually
    move the statistics, or the composition is untested)."""
    from duckdb_parquet_parser_spark.catalog import load_table
    from duckdb_parquet_parser_spark.operators.bpe_trainer import (
        q_ns_bpe_merges,
        q_ns_bpe_merges_curated,
    )
    from duckdb_parquet_parser_spark.operators.ngram_stats import (
        LOGIT_BIAS,
        LOGIT_W_CHARS,
        LOGIT_W_DISTINCT,
        LOGIT_W_TOKENS,
    )
    from duckdb_parquet_parser_spark.operators.pending_r15 import (
        CURATE_MIN_LOGIT,
    )

    got = [
        tuple(r)
        for r in q_ns_bpe_merges_curated(spark, sf_smoke)
        .orderBy("rank")
        .collect()
    ]

    wc: Counter = Counter()
    n_docs = n_kept = 0
    for (text,) in (
        load_table(spark, sf_smoke, "documents").select("text").collect()
    ):
        if text is None:
            continue
        n_docs += 1
        toks = text.split(" ")
        logit = (
            LOGIT_BIAS
            + len(toks) * LOGIT_W_TOKENS
            + len(set(toks)) * LOGIT_W_DISTINCT
            + len(text) * LOGIT_W_CHARS
        )
        if logit < CURATE_MIN_LOGIT:
            continue
        n_kept += 1
        for w in toks:
            if w:
                wc[w] += 1
    ref_rules, _ = _ref_bpe(wc, BPE_MERGES)
    assert got == ref_rules
    # the gate must be load-bearing on the fixture...
    assert 0 < n_kept < n_docs
    # ...and must actually change the learned statistics vs raw
    raw = [
        tuple(r)
        for r in q_ns_bpe_merges(spark, sf_smoke).orderBy("rank").collect()
    ]
    assert got != raw
