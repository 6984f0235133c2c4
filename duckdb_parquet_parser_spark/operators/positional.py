"""Positional string stream + chunked inverted index — reference ops R10, X1.

R10 (parquet_reader.cpp:295-473): lazily yield ``(global_row_pos, len, str)``
for every non-null string, position accumulated in file order
(``pos = row_group_base + values_read + i``, :398).

X1 (main.cpp:7-38): pack the stream into ~4096-byte chunks (cost per value =
4-byte length prefix + bytes), record ``tuple_to_chunk[pos] = chunk_id``.

Scale design (SURVEY.md §7.5):
- Oracle-facing queries use a deterministic order key (``doc_id``) —
  identical semantics in Spark and DuckDB.
- A global ``Window.orderBy`` serializes through one task, which is wrong at
  100 TB, so `file_order_positions` provides the scale path: per-partition
  counts → driver-side prefix sum (O(#partitions)) → per-partition offset
  add. One extra cheap pass over partition *counts*, no data shuffle at all.
- Chunk ids at scale come from the same prefix-sum trick over byte sizes
  (`scalable_chunk_ids`): partition-local running sums + per-partition byte
  offsets, again shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

CHUNK_SIZE = 4096  # main.cpp:7
LEN_PREFIX_BYTES = 4  # main.cpp:30 — u32 length prefix per value


def with_positions(df: DataFrame, order_col: str, pos_col: str = "pos") -> DataFrame:
    """R10 with a deterministic order key (fixture rule: FIXTURES.md §2)."""
    w = Window.orderBy(order_col)
    return df.withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))


def file_order_positions(df: DataFrame, pos_col: str = "pos") -> DataFrame:
    """True file-order positions, shuffle-free (zipWithIndex pattern).

    Two passes: (1) count rows per partition (cheap — count only), (2) add
    the partition's base offset to a partition-local running index. This is
    the 100 TB-safe equivalent of the reference's single-threaded
    ``row_group_base + values_read + i`` accumulation.
    """
    sdf = df
    rdd = sdf.rdd.zipWithIndex()
    schema = sdf.schema.add(pos_col, "long", False)
    return sdf.sparkSession.createDataFrame(
        rdd.map(lambda t: (*t[0], t[1])), schema
    )


def scalable_chunk_ids(
    df: DataFrame,
    column: str = "text",
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """X1 chunk assignment with NO shuffle at any scale — the 100 TB path.

    Two passes, mirroring :func:`file_order_positions`:

    1. per-partition totals (row count + byte sum) — collect #partitions
       tiny tuples to the driver, prefix-sum them into offsets;
    2. per-partition local running sums + the partition's offsets.

    Uses the same closed-form boundary rule as :func:`with_chunk_ids`
    (``chunk_id = floor(bytes_before / chunk_size)``), so the two agree
    exactly (asserted in tests/test_positional.py) while this variant never
    serializes the data through a single global-window task.
    """
    data = df.select(F.col(column).alias("value"))
    rdd = data.rdd.map(lambda r: r[0])

    # Positions count every row (nulls occupy positions, F2 rule); bytes
    # accumulate only over non-null values (the iterator skips them).
    def totals(idx, it):
        rows = bytes_ = 0
        for v in it:
            rows += 1
            if v is not None:
                bytes_ += LEN_PREFIX_BYTES + len(v)
        yield idx, rows, bytes_

    parts = sorted(rdd.mapPartitionsWithIndex(totals).collect())
    row_off, byte_off, offsets = 0, 0, {}
    for idx, rows, bytes_ in parts:
        offsets[idx] = (row_off, byte_off)
        row_off += rows
        byte_off += bytes_

    def assign(idx, it):
        pos, cum = offsets[idx]
        for v in it:
            if v is not None:
                yield pos, cum // chunk_size
                cum += LEN_PREFIX_BYTES + len(v)
            pos += 1

    out_schema = "pos long, chunk_id long"
    return data.sparkSession.createDataFrame(
        rdd.mapPartitionsWithIndex(assign), out_schema
    )


def positional_stream(df: DataFrame, column: str, order_col: str) -> DataFrame:
    """(pos, len, value) for non-null strings; positions computed over the
    UNFILTERED order (nulls occupy positions but are not emitted —
    parquet_reader.cpp:417-453)."""
    return (
        with_positions(df, order_col)
        .filter(F.col(column).isNotNull())
        .select(
            "pos",
            F.length(F.col(column)).cast("long").alias("len"),
            F.col(column).alias("value"),
        )
    )


def with_chunk_ids(
    df: DataFrame,
    column: str = "text",
    order_col: str = "doc_id",
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """X1 chunk assignment, closed-form window formula (FIXTURES.md rule 3):

    ``chunk_id = floor((cumsum(4 + len) - (4 + len)) / chunk_size)``

    i.e. a value starts a new chunk when the bytes *before* it already
    crossed the boundary — the reference's check-before-append rule
    approximated as a prefix sum both engines express identically.
    """
    cost = LEN_PREFIX_BYTES + F.length(F.col(column))
    w = Window.orderBy("pos")
    cum = F.sum(cost).over(w)
    out = (
        with_positions(df, order_col)
        .filter(F.col(column).isNotNull())
        .withColumn(
            "chunk_id",
            F.floor((cum - cost) / F.lit(chunk_size)).cast("long"),
        )
    )
    return out


def greedy_chunk_ids_pandas(
    df: DataFrame,
    column: str = "text",
    order_col: str = "doc_id",
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """X1 *exact* greedy rule (main.cpp:24-28: close chunk when accumulated
    size ≥ chunk_size BEFORE appending — chunks overshoot by ≤ 1 value).

    Single ordered pass via applyInPandas over one logical group. Exists
    for bit-parity with the sequential reference; the formula variant above
    is the scalable default. Tested against a pure-Python reference in
    tests/test_positional.py.
    """
    import pandas as pd

    pos_df = (
        with_positions(df, order_col)
        .filter(F.col(column).isNotNull())
        .select("pos", F.col(column).alias("value"))
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        chunk_ids = []
        chunk_id = 0
        current = 0
        for v in pdf["value"]:
            if current >= chunk_size:
                chunk_id += 1
                current = 0
            chunk_ids.append(chunk_id)
            current += LEN_PREFIX_BYTES + len(v)
        pdf["chunk_id"] = pd.Series(chunk_ids, dtype="int64")
        return pdf[["pos", "chunk_id"]]

    return (
        pos_df.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(assign, "pos long, chunk_id long")
    )


def q_r10_positional_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return positional_stream(df, "text", "doc_id").select("pos", "len")


def q_x1_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk stats: the reference's end-of-run report (main.cpp:34-35)
    generalized — chunk count, values per chunk, payload bytes per chunk."""
    df = load_table(spark, sf_dir, "documents")
    return (
        with_chunk_ids(df)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.length("text") + F.lit(LEN_PREFIX_BYTES)).alias("chunk_bytes"),
        )
    )


def q_x1_tuple_to_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuple_to_chunk positional map (main.cpp:31)."""
    df = load_table(spark, sf_dir, "documents")
    return with_chunk_ids(df).select("pos", "chunk_id")


def q_r10_file_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 with TRUE file-order positions (zipWithIndex prefix-sum — the
    scale path; no global window). The fixture writes documents in doc_id
    order, so the deterministic oracle applies to file order too (asserted
    in tests/test_positional.py)."""
    df = load_table(spark, sf_dir, "documents")
    return (
        file_order_positions(df)
        .filter(F.col("text").isNotNull())
        .select("pos", F.length("text").cast("long").alias("len"))
    )


def q_x1_chunk_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 with the reference's EXACT greedy boundary rule (main.cpp:24-28:
    close the chunk when accumulated bytes ≥ 4096 *before* appending, so
    chunks overshoot by ≤ 1 value). Sequential by definition → single
    ordered applyInPandas pass; no SQL-window closed form exists, so this
    is a rows-only driver check, verified against a pure-Python reference
    implementation in tests/test_positional.py."""
    df = load_table(spark, sf_dir, "documents")
    return greedy_chunk_ids_pandas(df)


QUERIES = {
    "r10_positional_stream": q_r10_positional_stream,
    "r10_file_order": q_r10_file_order,
    "x1_chunk_index": q_x1_chunk_index,
    "x1_tuple_to_chunk": q_x1_tuple_to_chunk,
    "x1_chunk_greedy": q_x1_chunk_greedy,
}

_POS_CTE = """
    WITH pos AS (
        SELECT text, row_number() OVER (ORDER BY doc_id) - 1 AS pos
        FROM documents
    ), nn AS (
        SELECT * FROM pos WHERE text IS NOT NULL
    ), chunked AS (
        SELECT pos, text,
               CAST(floor((sum(4 + length(text)) OVER (ORDER BY pos)
                           - (4 + length(text))) / 4096) AS BIGINT) AS chunk_id
        FROM nn
    )
"""

_R10_SQL = """
        WITH pos AS (
            SELECT text, row_number() OVER (ORDER BY doc_id) - 1 AS pos
            FROM documents
        )
        SELECT CAST(pos AS BIGINT) AS pos,
               CAST(length(text) AS BIGINT) AS len
        FROM pos WHERE text IS NOT NULL
    """

ORACLES = {
    "r10_positional_stream": _R10_SQL,
    # fixture file order == doc_id order (tests/test_positional.py pins it)
    "r10_file_order": _R10_SQL,
    "x1_chunk_index": _POS_CTE
    + """
        SELECT chunk_id, count(*) AS n_values,
               sum(length(text) + 4) AS chunk_bytes
        FROM chunked GROUP BY chunk_id
    """,
    "x1_tuple_to_chunk": _POS_CTE
    + """
        SELECT CAST(pos AS BIGINT) AS pos, chunk_id FROM chunked
    """,
}
