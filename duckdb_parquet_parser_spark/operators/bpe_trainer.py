"""Distributed BPE tokenizer TRAINING — the merge loop (staged r15,
VERDICT r14 #6; queues behind the pending_r15/r16 tranches for a
round-17+ registration slot).

``pending_r16.ns_bpe_pair_counts`` is the per-iteration job of a BPE
trainer; this module iterates it: starting from per-character symbol
sequences over the corpus word-frequency table, repeat ``BPE_MERGES``
times — count adjacent symbol pairs (weighted by word frequency), take
the argmax pair (count DESC, then (left, right) ASC — fully
deterministic), and rewrite every word's symbols by greedy left-to-right
non-overlapping application of the new rule (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units").

Scale shape (the point of doing this on Spark):

- The corpus is touched ONCE: the word-frequency aggregation (one hash
  shuffle on the word). Everything after runs on the (word, freq)
  table, which is vocabulary-of-words-sized — at 100 TB of text that is
  ~10^8 rows of short strings, not 10^11 documents. This is exactly how
  production BPE trainers (SentencePiece, GPT-2's encoder build) are
  structured: count words first, train on the count table.
- Per iteration: ONE hash aggregation over exploded adjacent pairs
  (map-side partials; the aggregated pair table is symbol-vocabulary-
  sized), ONE bounded driver collect of exactly one row (the argmax —
  the driver's whole state is the ≤K-row merge table, the textbook
  driver-holds-the-rules shape), and ONE narrow per-row rewrite of the
  symbols column with the new rule inlined as literals (no join, no
  shuffle). The rewritten table is eagerly localCheckpoint-ed so the
  next iteration's lineage is one step deep, and the previous
  checkpoint is unpersisted — peak storage is two copies of the
  word table regardless of K.
- The merge application is a single Catalyst ``aggregate`` (fold) over
  the symbol array: append the next symbol, or replace the accumulator
  tail when it equals the rule's left side and the incoming symbol the
  right side. Greedy left-to-right non-overlap falls out of the fold
  order: once (a, b) merges into ab, the tail no longer equals a, so
  "aaa" under (a,a) → [aa, a] exactly like the reference trainer.
  Per-word cost is O(len²) array copies on ≤word-length arrays —
  JVM-side, no Python in the loop.

Certification: the training loop is iterative-with-driver-decisions, so
it is one of the documented non-SQL-expressible cases (the driver
contract's rows-only class — no ``ORACLES`` entry). Its differential
runs in tests/test_bpe_trainer.py instead: an independent pure-Python
reference trainer over the same fixtures must reproduce the merge table
BIT-EXACTLY (rank, pair, merged token, count) at sf0.001 and sf0.01,
plus the final symbol vocabulary, plus randomized-docs unicode pressure.

Reference analog: none (the reference — parquet_reader.cpp /
parquet_writer.cpp — has no tokenizer surface; the brief's
training-data-pipeline mandate does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

BPE_MERGES = 24  # merge rules to learn (fixture-scale; a prod run uses ~30k)

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def word_frequency_table(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(word, freq) over whitespace-split document text — the ONE
    corpus-wide shuffle of the whole training run. Empty tokens from
    consecutive spaces are dropped (they carry no symbols); 1-char
    words stay: they contribute no pairs but are part of the vocabulary
    the trainer must not lose.

    ``docs`` overrides the corpus with any (…, text) frame — the
    curated-corpus composition hands the quality-gated subset in."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull())
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(name: str) -> Column:
    """Word column → per-character symbol array (code-point granularity
    — the same unit both the Python reference and ns_bpe_pair_counts
    use). Callers guarantee char_length ≥ 1: Spark's ``sequence(1, 0)``
    is DESCENDING ([1, 0]), so an empty string would produce garbage
    rather than an empty array."""
    return F.expr(
        f"transform(sequence(1, char_length({name})),"
        f" i -> substring({name}, i, 1))"
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of ONE merge
    rule to a symbol array, as a Catalyst fold (no Python, no shuffle).

    Fold step: if the accumulator's last symbol equals ``left`` and the
    incoming symbol equals ``right``, replace the tail with the merged
    token; otherwise append. Non-overlap is automatic: the merged token
    ``left+right`` can never equal ``left`` (strictly longer), so a
    just-merged tail never re-matches."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession,
    sf_dir: str,
    merges: int = BPE_MERGES,
    docs: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run the merge loop. Returns (merge_rules, final_word_table).

    ``merge_rules``: ``[(rank, left, right, token, pair_count), ...]``
    in learned order — the driver-side state, ≤``merges`` rows.
    ``final_word_table``: (w, freq, syms) after all rules applied — the
    distinct-symbol projection of this is the learned vocabulary.

    Stops early when no adjacent pair remains (fixture corpora can
    exhaust before ``merges`` rules; the Python reference stops on the
    same condition)."""
    wc = word_frequency_table(spark, sf_dir, docs=docs).withColumn(
        "syms", _initial_symbols("w")
    )
    wc = wc.localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, str, int]] = []
    try:
        for it in range(1, merges + 1):
            pairs = (
                wc.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(syms) - 1),"
                            " i -> struct(element_at(syms, i) AS l,"
                            " element_at(syms, i + 1) AS r))"
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("n"))
            )
            top = (
                pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            rules.append((it, left, right, left + right, n))
            nxt = wc.withColumn(
                "syms", _apply_merge(F.col("syms"), left, right)
            ).localCheckpoint(eager=True)
            wc.unpersist()
            wc = nxt
    except Exception:
        wc.unpersist()
        raise
    return rules, wc


def q_ns_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table as a query: ``BPE_MERGES`` rules with
    rank, pair, merged token, and the pair count at merge time. The
    rows ARE the driver state (≤24 here), so materializing them via
    createDataFrame is the bounded-driver-collect pattern, not a data
    collect."""
    rules, wc = train_bpe(spark, sf_dir)
    wc.unpersist()
    return spark.createDataFrame(rules, _MERGE_SCHEMA)


def tokenize_words(words: DataFrame, rules: list) -> DataFrame:
    """Apply a learned merge table to a (w,) word frame → (w, toks).

    Rules apply SEQUENTIALLY in rank order, each greedily left-to-right
    across the word (Sennrich's original apply loop). For rules learned
    by a self-consistent trainer this equals the priority-queue
    inference real tokenizers use: a merged symbol can only participate
    in rules learned AFTER the rule that created it, so a lower-rank
    rule can never become newly applicable once passed — rank order is
    already topological. The whole application is ONE nested Catalyst
    projection (K folds deep), no Python, no shuffle, no join."""
    syms = _initial_symbols("w")
    for _rank, left, right, _token, _n in rules:
        syms = _apply_merge(syms, left, right)
    return words.select("w", syms.alias("toks"))


def q_ns_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE at corpus scale with the corpus's own learned
    merges — the capstone composition (train → apply) that makes the
    token-budget/mixture operators runnable on a REAL subword unit
    instead of whitespace words.

    Scale shape: the expensive K-fold merge application runs over the
    DISTINCT word table (vocabulary-sized — at 100 TB, ~10^8 short rows,
    not 10^11 documents), exactly once per word; documents then explode
    to (doc_id, w) and pick up each word's token count through one
    equi-join on the word, followed by one per-doc aggregation. Two
    shuffles total at any scale (word join + doc agg); the fold itself
    is a narrow JVM-side projection.

    Output: (doc_id, n_words, n_bpe_tokens) — null-text docs are absent
    (they carry no words), empty-token runs are dropped like the
    trainer drops them."""
    rules, wc = train_bpe(spark, sf_dir)
    # wc already holds every distinct word WITH its final segmentation —
    # reuse it instead of re-tokenizing (train's last checkpoint IS the
    # applied-merges table; tokenize_words exists for foreign corpora)
    word_tokens = wc.select(
        "w", F.size("syms").alias("word_toks")
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    doc_words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 1)
    out = (
        doc_words.join(word_tokens, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_toks").alias("n_bpe_tokens"),
        )
    )
    # materialize before unpersisting the checkpointed word table the
    # plan reads from
    out = out.localCheckpoint(eager=True)
    wc.unpersist()
    return out


def q_ns_bpe_merges_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training on the CURATED corpus — the composition real
    pipelines run: the quality gate decides which documents exist, and
    the tokenizer's statistics (hence its merge table and vocabulary)
    are learned from the kept subset only. Training a tokenizer on raw
    data and filtering afterwards bakes junk tokens into the vocab; the
    order of composition is the point, and the differential pins it —
    the reference trainer runs on the Python-side replica of the SAME
    integer-exact gate decision, so a drift in either the gate or the
    trainer breaks the match. The gate is the PIPELINE-CALIBRATED one
    (``pending_r15.CURATE_MIN_LOGIT``, the curate_epoch quality stage)
    — the certified ``keep`` flag's 0 threshold is deliberately strict
    and keeps nothing on the fixture corpora (all logits land in
    −55k..−30k), which would train a tokenizer on the empty set.

    The gate is consumed by a doc_id equi-join rather than re-spelling
    the logit expression here (the REVIEW_r14 #3 drift lesson; the kept
    set is the MAJORITY of the corpus, so it must never broadcast —
    one co-partitioned shuffle at any scale). When r16's logit
    consolidation exposes the expression as a reusable Column builder,
    this becomes an inline zero-shuffle filter."""
    from .ngram_stats import q_ns_quality_logit
    from .pending_r15 import CURATE_MIN_LOGIT

    kept = (
        q_ns_quality_logit(spark, sf_dir)
        .filter(F.col("logit_micro") >= CURATE_MIN_LOGIT)
        .select("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents").join(kept, "doc_id")
    rules, wc = train_bpe(spark, sf_dir, docs=docs)
    wc.unpersist()
    return spark.createDataFrame(rules, _MERGE_SCHEMA)


# Staged for a round-17+ window slot (rows-only driver check when they
# register: the merge loop is iterative with per-iteration driver
# argmax decisions — the documented non-SQL-expressible class; the
# differential is the pure-Python reference trainer in
# tests/test_bpe_trainer.py, run at two SFs + randomized fixtures every
# round, same staging discipline as pending_r14/15/16).
QUERIES_PENDING_R17 = {
    "ns_bpe_merges": q_ns_bpe_merges,
    "ns_bpe_tokenize": q_ns_bpe_tokenize,
    "ns_bpe_merges_curated": q_ns_bpe_merges_curated,
}
ORACLES_PENDING_R17: dict[str, str] = {}
