"""Byte-level reference-style writer (sources/pywriter.py, W4-W6):
rule-level unit tests for the reference's encode decisions plus
multi-engine read-back — pyarrow AND DuckDB must read our hand-assembled
bytes identically to the input, and our OWN page walker's byte
accounting (the r7 invariants) must hold on our own files."""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq
import pytest

from duckdb_parquet_parser_spark.inspect import file_metadata, walk_pages
from duckdb_parquet_parser_spark.sources.pywriter import (
    ColumnSpec,
    MAX_UNCOMPRESSED_PAGE_SIZE,
    ReferenceParquetWriter,
    _dict_page_boundaries,
    _plain_page_boundaries,
    _RleBpEncoder,
    analyze_dictionary,
    write_reference_bytes,
)

UTF8 = 0


def _roundtrip(tmp_path, specs, cols, name="t.parquet"):
    path = str(tmp_path / name)
    write_reference_bytes(path, specs, cols)
    return path, pq.read_table(path)


def test_mixed_types_roundtrip_pyarrow_and_duckdb(tmp_path):
    n = 900
    specs = [
        ColumnSpec("id", "int64", "required"),
        ColumnSpec("cat", "byte_array", converted_type=UTF8),  # dict path
        ColumnSpec("txt", "byte_array", converted_type=UTF8),  # plain path
        ColumnSpec("score", "double"),
        ColumnSpec("flag", "boolean"),
        ColumnSpec("small", "int32"),
        ColumnSpec("ratio", "float"),
    ]
    cols = [
        list(range(n)),
        [["aa", "bb", "cc", None][i % 4] for i in range(n)],
        [None if i % 17 == 0 else f"text-{i}-" + "x" * (i % 23) for i in range(n)],
        [None if i % 13 == 0 else i * 0.5 for i in range(n)],
        [None if i % 11 == 0 else (i % 3 == 0) for i in range(n)],
        [None if i % 7 == 0 else i - 450 for i in range(n)],
        [None if i % 5 == 0 else float(i) for i in range(n)],
    ]
    path, t = _roundtrip(tmp_path, specs, cols)
    for s, expect in zip(specs, cols):
        assert t.column(s.name).to_pylist() == pytest.approx(expect), s.name

    # DuckDB agrees on aggregates over every column
    con = duckdb.connect()
    got = con.execute(
        f"SELECT count(*), sum(id), count(cat), count(txt), sum(score), "
        f"sum(CASE WHEN flag THEN 1 ELSE 0 END), sum(small), sum(ratio) "
        f"FROM '{path}'"
    ).fetchone()
    assert got == (
        n,
        sum(cols[0]),
        sum(v is not None for v in cols[1]),
        sum(v is not None for v in cols[2]),
        sum(v for v in cols[3] if v is not None),
        sum(1 for v in cols[4] if v),
        sum(v for v in cols[5] if v is not None),
        sum(v for v in cols[6] if v is not None),
    )

    # footer claims match the reference's rules
    meta = pq.ParquetFile(path).metadata
    by_name = {
        meta.row_group(0).column(c).path_in_schema: meta.row_group(0).column(c)
        for c in range(meta.num_columns)
    }
    assert by_name["cat"].has_dictionary_page  # 3 uniques <= 675/5
    assert not by_name["txt"].has_dictionary_page  # all-unique falls back
    assert not by_name["flag"].has_dictionary_page  # boolean never dicts
    assert by_name["txt"].total_compressed_size == by_name["txt"].total_uncompressed_size


def test_own_walker_invariants_hold_on_own_files(tmp_path):
    """The byte accounting r7_chunk_bytes certifies on parquet-mr files
    must hold on OUR files too — writer and walker agree end to end."""
    n = 1100
    specs = [
        ColumnSpec("k", "int64", "required"),
        ColumnSpec("s", "byte_array", converted_type=UTF8),
    ]
    cols = [
        list(range(n)),
        [None if i % 9 == 0 else f"v{i % 6}" for i in range(n)],  # dict path
    ]
    path, _ = _roundtrip(tmp_path, specs, cols)
    meta = file_metadata(path)
    agg: dict[tuple[int, int], list[int]] = {}
    for p in walk_pages(path):
        a = agg.setdefault((p.row_group, p.column), [0, 0, 0])
        a[0] += p.header_size + p.compressed_size
        a[1] += p.header_size + p.uncompressed_size
        if p.page_type in ("DATA_PAGE", "DATA_PAGE_V2"):
            a[2] += p.num_values
    for rg in range(meta.num_row_groups):
        for c in range(meta.num_columns):
            col = meta.row_group(rg).column(c)
            assert agg[(rg, c)] == [
                col.total_compressed_size,
                col.total_uncompressed_size,
                col.num_values,
            ]
    # the 1 KB PLAIN split produced many pages for the int64 column
    k_pages = [p for p in walk_pages(path) if p.column == 0]
    assert len(k_pages) == (n * 8 + MAX_UNCOMPRESSED_PAGE_SIZE - 1) // MAX_UNCOMPRESSED_PAGE_SIZE


def test_dict_decision_rule():
    """dict iff 0 < uniques <= non_null // 5 (parquet_writer.cpp:271-272),
    integer division, nulls excluded; boolean never."""
    vals = ["a", "b", "c"] * 5  # 3 uniques, 15 non-null -> 3 <= 3
    assert analyze_dictionary(vals, "byte_array") is not None
    vals = ["a", "b", "c"] * 4 + ["a", "b"]  # 3 uniques, 14 -> 3 > 2
    assert analyze_dictionary(vals, "byte_array") is None
    assert analyze_dictionary([], "byte_array") is None
    assert analyze_dictionary([None] * 10, "byte_array") is None
    assert analyze_dictionary([True] * 100, "boolean") is None
    # first-seen order
    dict_values, index = analyze_dictionary(["b", "a", "b", "a", "a", "b", "a", "b", "a", "b"], "byte_array")
    assert dict_values == ["b", "a"] and index == {"b": 0, "a": 1}


def test_page_boundary_rules():
    """PLAIN: close the page ON the value that reaches 1024 estimated
    bytes (parquet_writer.cpp:56-80); dict: 1024 // ceil(bw/8) indices
    per page (:84-98); nulls cost 0 in the estimate."""
    # 300 int32s of 4B: page closes at value 256 (1024 bytes reached)
    assert _plain_page_boundaries([1] * 300, "int32") == [(0, 256), (256, 44)]
    # nulls don't advance the estimate
    vals = [None, None] + [1] * 256 + [None]
    assert _plain_page_boundaries(vals, "int32") == [(0, 258), (258, 1)]
    # a single huge string is its own page
    assert _plain_page_boundaries(["x" * 5000, "y"], "byte_array") == [(0, 1), (1, 1)]
    # dict: bw<=8 -> 1024 indices per page
    assert _dict_page_boundaries(2500, 3) == [(0, 1024), (1024, 1024), (2048, 452)]
    # bw 9..16 -> 2-byte indices -> 512 per page
    assert _dict_page_boundaries(600, 12) == [(0, 512), (512, 88)]


def test_rle_bp_encoder_shapes():
    """Runs >= 4 flush as RLE; shorter runs commit to zero-padded 8-value
    bit-packed groups (rle_bp_encoder.hpp:12-66)."""
    enc = _RleBpEncoder(1)
    for v in [1, 1, 1, 1, 1]:
        enc.write(v)
    assert enc.finish() == bytes([5 << 1, 1])  # one RLE run of 5

    enc = _RleBpEncoder(1)
    for v in [1, 0, 1, 0, 1, 0, 1, 0]:
        enc.write(v)
    out = enc.finish()
    assert out[0] == (1 << 1) | 1  # one bit-packed group of 8
    assert out[1] == 0b01010101  # LSB-first packing

    enc = _RleBpEncoder(2)
    for v in [3, 2]:  # short run -> padded bit-packed group
        enc.write(v)
    out = enc.finish()
    assert out[0] == (1 << 1) | 1
    assert out[1] == 0b00001011 and out[2] == 0


def test_multi_row_group_and_errors(tmp_path):
    path = str(tmp_path / "rg.parquet")
    w = ReferenceParquetWriter(path, [ColumnSpec("a", "int32", "required")])
    w.write_row_group([[1, 2, 3]])
    w.write_row_group([[4, 5]])
    w.close()
    meta = pq.ParquetFile(path).metadata
    assert meta.num_row_groups == 2
    assert pq.read_table(path).column("a").to_pylist() == [1, 2, 3, 4, 5]
    w.close()  # idempotent

    with pytest.raises(RuntimeError):
        w.write_row_group([[6]])
    w2 = ReferenceParquetWriter(str(tmp_path / "e1.parquet"), [ColumnSpec("a", "int32", "required")])
    with pytest.raises(ValueError):
        w2.write_row_group([[1], [2]])  # column count mismatch
    with pytest.raises(ValueError):
        w2.write_row_group([[1, None]])  # null in required column
    with pytest.raises(ValueError):
        ReferenceParquetWriter(str(tmp_path / "e2.parquet"), [ColumnSpec("a", "int128")])


def test_fuzz_roundtrip(tmp_path):
    """Random optional columns -> write -> pyarrow read-back equality.
    Exercises dict/plain selection, page splits, level runs, empty and
    all-null columns."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis unavailable")

    n_examples = 25 * int(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))
    _text = st.one_of(st.none(), st.text(max_size=40))
    _i64 = st.one_of(st.none(), st.integers(-(2**62), 2**62))
    _i32 = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))
    _f64 = st.one_of(st.none(), st.floats(allow_nan=False, width=64))
    _bool = st.one_of(st.none(), st.booleans())
    row = st.tuples(_i64, _text, _f64, _bool, _i32)

    counter = iter(range(10**9))

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(row, max_size=300))
    def _prop(rows):
        cols = [list(c) for c in zip(*rows)] if rows else [[], [], [], [], []]
        specs = [
            ColumnSpec("a", "int64"),
            ColumnSpec("b", "byte_array", converted_type=UTF8),
            ColumnSpec("c", "double"),
            ColumnSpec("d", "boolean"),
            ColumnSpec("e", "int32"),
        ]
        path = str(tmp_path / f"fz{next(counter)}.parquet")
        write_reference_bytes(path, specs, cols)
        t = pq.read_table(path)
        assert t.num_rows == len(rows)
        for s, expect in zip(specs, cols):
            assert t.column(s.name).to_pylist() == expect, s.name

    _prop()


def test_dict_preserves_signed_zero_and_nan_bits(tmp_path):
    """Bit-exact float dict keys (docstring divergence (3)): -0.0 and
    +0.0 are distinct dictionary entries, NaNs dict to ONE entry, and
    all round-trip bit-for-bit."""
    import math
    import struct as _struct

    vals = ([0.0, -0.0, float("nan"), 1.5] * 10)[:40]  # 4 uniques <= 40//5
    path = str(tmp_path / "zero.parquet")
    write_reference_bytes(path, [ColumnSpec("x", "double")], [vals])
    meta = pq.ParquetFile(path).metadata
    assert meta.row_group(0).column(0).has_dictionary_page
    back = pq.read_table(path).column("x").to_pylist()
    for got, want in zip(back, vals):
        assert _struct.pack("<d", got) == _struct.pack("<d", want)
    assert math.copysign(1.0, back[1]) == -1.0


def test_exit_on_exception_aborts_without_footer(tmp_path):
    """A with-body failure must NOT produce a valid parquet file — the
    footer is only written on clean exit."""
    path = str(tmp_path / "abort.parquet")
    with pytest.raises(ValueError):
        with ReferenceParquetWriter(path, [ColumnSpec("a", "int32", "required")]) as w:
            w.write_row_group([[1, 2, 3]])
            raise ValueError("boom")
    raw = open(path, "rb").read()
    assert not raw.endswith(b"PAR1")  # no footer -> unreadable as a table
    with pytest.raises(Exception):
        pq.read_table(path)


def test_byte_array_rejects_non_string_values(tmp_path):
    with pytest.raises(TypeError):
        write_reference_bytes(
            str(tmp_path / "bad.parquet"),
            [ColumnSpec("s", "byte_array")],
            [["ok", 7, "also-ok"]],
        )
