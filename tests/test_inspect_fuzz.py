"""Differential fuzz of the pure-Python Thrift page-header walker
(`inspect.walk_pages` / `page_stats`) against pyarrow's own footer
metadata, across the writer-configuration matrix the walker claims to
handle (R5/R6): v1/v2 data pages, every bundled codec, dictionary on/off,
tiny pages (many pages per chunk), nulls, and multiple row groups.

The footer is ground truth the walker never reads per-page: if the walker
mis-parses any page header (wrong compressed size → desynced offset;
wrong num_values → wrong termination) the per-chunk totals cannot come
back consistent, so these invariants catch byte-level parse bugs without
golden files. The reference's own DATA_PAGE_V2 infinite-loop quirk
(SURVEY.md §3.1) is exactly the class of bug this pins down.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_parquet_parser_spark.inspect import page_stats, walk_pages


def _table(seed: int, n: int = 700) -> pa.Table:
    rng = random.Random(seed)
    ints = [rng.randrange(-(2**40), 2**40) if rng.random() > 0.1 else None for _ in range(n)]
    floats = [rng.uniform(-1e6, 1e6) if rng.random() > 0.1 else None for _ in range(n)]
    # low-cardinality strings make the dictionary path meaningful; long
    # tails make v2 pages split mid-chunk
    words = ["alpha", "beta", "gamma", "delta" * 20, "", "épsilon"]
    strs = [rng.choice(words) if rng.random() > 0.05 else None for _ in range(n)]
    bools = [rng.random() > 0.5 if rng.random() > 0.1 else None for _ in range(n)]
    return pa.table(
        {
            "i": pa.array(ints, pa.int64()),
            "f": pa.array(floats, pa.float64()),
            "s": pa.array(strs, pa.string()),
            "b": pa.array(bools, pa.bool_()),
        }
    )


CONFIGS = [
    # (codec, data_page_version, use_dictionary, data_page_size, row_group_size)
    ("none", "1.0", True, 512, 200),
    ("none", "2.0", True, 512, 200),
    ("snappy", "1.0", False, 1024, 250),
    ("snappy", "2.0", True, 256, 700),
    ("zstd", "1.0", True, 4096, 300),
    ("zstd", "2.0", False, 512, 150),
    ("gzip", "1.0", True, 1024, 700),
    ("gzip", "2.0", True, 2048, 350),
]


@pytest.mark.parametrize(
    "codec,dpv,use_dict,page_size,rg_size", CONFIGS,
    ids=[f"{c}-v{v}-dict{d}-ps{p}-rg{r}" for c, v, d, p, r in CONFIGS],
)
def test_walker_consistent_with_footer(
    tmp_path, codec, dpv, use_dict, page_size, rg_size
):
    path = str(tmp_path / "fuzz.parquet")
    seed = hash((codec, dpv, use_dict, page_size, rg_size)) & 0xFFFF
    pq.write_table(
        _table(seed),
        path,
        compression=codec,
        data_page_version=dpv,
        use_dictionary=use_dict,
        data_page_size=page_size,
        row_group_size=rg_size,
        write_statistics=True,
    )
    meta = pq.ParquetFile(path).metadata
    pages = walk_pages(path)

    # coverage: every (row_group, column) chunk was walked
    chunks = {(p.row_group, p.column) for p in pages}
    assert chunks == {
        (rg, c)
        for rg in range(meta.num_row_groups)
        for c in range(meta.num_columns)
    }

    for rg_idx in range(meta.num_row_groups):
        rg = meta.row_group(rg_idx)
        for col_idx in range(rg.num_columns):
            col = rg.column(col_idx)
            mine = [
                p for p in pages if (p.row_group, p.column) == (rg_idx, col_idx)
            ]
            # termination: data-page values sum exactly to the chunk total
            data_values = sum(
                p.num_values
                for p in mine
                if p.page_type in ("DATA_PAGE", "DATA_PAGE_V2")
            )
            assert data_values == col.num_values, (rg_idx, col_idx)
            # v2 files yield v2 pages (the reference's infinite-loop case)
            if dpv == "2.0":
                assert any(p.page_type == "DATA_PAGE_V2" for p in mine)
            # dictionary page iff the footer says the chunk has one
            n_dict = sum(p.page_type == "DICTIONARY_PAGE" for p in mine)
            assert n_dict == int(col.has_dictionary_page), (rg_idx, col_idx)
            # offset chain: strictly increasing, starts at the chunk start,
            # and header+payload sizes account for every chunk byte
            offsets = [p.offset for p in mine]
            assert offsets == sorted(set(offsets))
            start = col.data_page_offset
            if col.has_dictionary_page and col.dictionary_page_offset is not None:
                start = min(start, col.dictionary_page_offset)
            assert offsets[0] == start
            # byte accounting: each stride is (header + compressed payload),
            # so chunk-start → end-of-last-page must equal the footer's
            # total_compressed_size exactly — any header mis-parse desyncs
            last = mine[-1]
            walked_total = (
                (last.offset - start)
                + _header_size_of_last(path, last)
                + last.compressed_size
            )
            assert walked_total == col.total_compressed_size, (rg_idx, col_idx)

    # page_stats aggregates the same walk; cross-check one invariant
    stats = page_stats(path)
    assert sum(s["num_values"] for s in stats) == sum(
        meta.row_group(i).column(c).num_values
        for i in range(meta.num_row_groups)
        for c in range(meta.num_columns)
    )


def _header_size_of_last(path: str, page) -> int:
    """Re-read the last page's Thrift header to get its byte length (the
    walker exposes strides via offsets; the final stride needs the final
    header size explicitly)."""
    from duckdb_parquet_parser_spark.inspect import _CompactReader

    with open(path, "rb") as fh:
        data = fh.read()
    reader = _CompactReader(data, page.offset)
    hdr = reader.read_page_header()
    assert hdr.compressed_size == page.compressed_size
    return hdr.header_size


def test_walker_terminates_on_corrupt_headers(tmp_path):
    """Robustness against the reference's failure class (SURVEY §3.1
    infinite loop): flipping bytes inside each page header must make the
    walk raise or return — never hang or walk backwards. Every header
    byte position of every page gets one flip."""
    path = str(tmp_path / "c.parquet")
    pq.write_table(_table(1, n=300), path, data_page_size=256,
                   compression="none")
    intact = walk_pages(path)
    raw = open(path, "rb").read()
    for page in intact[:20]:
        for delta in (1, 3, 7):
            bad = bytearray(raw)
            bad[page.offset + delta] ^= 0xFF
            corrupt = str(tmp_path / "bad.parquet")
            open(corrupt, "wb").write(bytes(bad))
            try:
                result = walk_pages(corrupt)
            except Exception:
                continue  # loud failure is fine; hanging is not
            assert len(result) <= 10_000  # bounded output, no runaway


def test_walker_raises_on_truncated_file(tmp_path):
    path = str(tmp_path / "t.parquet")
    pq.write_table(_table(2, n=300), path, data_page_size=256,
                   compression="none")
    raw = open(path, "rb").read()
    # keep the footer (walker reads metadata from it via pyarrow) but cut
    # a hole before it so page strides point into the void
    cut = bytearray(raw)
    del cut[len(raw) // 3 : len(raw) // 3 + 40]
    trunc = str(tmp_path / "trunc.parquet")
    open(trunc, "wb").write(bytes(cut))
    with pytest.raises(Exception):
        walk_pages(trunc)


def test_walker_handles_nested_schemas(tmp_path):
    """Nested columns (list/struct) carry repetition/definition levels and
    their chunk num_values counts LEAF values, not rows — the walker's
    termination rule must still close every chunk exactly. Both data page
    versions exercised."""
    rng = random.Random(9)
    n = 400
    table = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "tags": pa.array(
                [
                    None
                    if rng.random() < 0.1
                    else [f"t{rng.randrange(5)}" for _ in range(rng.randrange(4))]
                    for _ in range(n)
                ],
                pa.list_(pa.string()),
            ),
            "meta": pa.array(
                [
                    {"a": rng.randrange(100), "b": None if rng.random() < 0.3 else f"s{i}"}
                    for i in range(n)
                ],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
        }
    )
    for dpv in ("1.0", "2.0"):
        path = str(tmp_path / f"nested_{dpv}.parquet")
        pq.write_table(table, path, data_page_version=dpv,
                       data_page_size=512, row_group_size=150)
        meta = pq.ParquetFile(path).metadata
        pages = walk_pages(path)
        for rg_idx in range(meta.num_row_groups):
            rg = meta.row_group(rg_idx)
            for col_idx in range(rg.num_columns):
                col = rg.column(col_idx)
                data_values = sum(
                    p.num_values
                    for p in pages
                    if (p.row_group, p.column) == (rg_idx, col_idx)
                    and p.page_type in ("DATA_PAGE", "DATA_PAGE_V2")
                )
                assert data_values == col.num_values, (dpv, rg_idx, col_idx)


# ---------------------------------------------------------------------------
# Raw-page layer (R6 bytes / R7 byte-capped chunk read / R8 iterator)
# ---------------------------------------------------------------------------

from duckdb_parquet_parser_spark.inspect import (  # noqa: E402
    PageIterator,
    build_page_index,
    read_page_data,
    read_pages_chunk,
)


@pytest.mark.parametrize(
    "codec,dpv,use_dict,page_size,rg_size", CONFIGS,
    ids=[f"{c}-v{v}-dict{d}-ps{p}-rg{r}" for c, v, d, p, r in CONFIGS],
)
def test_page_index_matches_footer_and_file_bytes(
    tmp_path, codec, dpv, use_dict, page_size, rg_size
):
    """The global data-page index (parquet_reader.cpp:559-605 analog):
    ids are consecutive and data-page-only; per-chunk value sums match the
    footer; every entry's [data_offset, +data_size) slice is exactly what
    read_page_data returns."""
    path = str(tmp_path / "raw.parquet")
    seed = hash(("raw", codec, dpv, use_dict, page_size, rg_size)) & 0xFFFF
    pq.write_table(
        _table(seed), path, compression=codec, data_page_version=dpv,
        use_dictionary=use_dict, data_page_size=page_size,
        row_group_size=rg_size,
    )
    meta = pq.ParquetFile(path).metadata
    index = build_page_index(path)
    with open(path, "rb") as fh:
        blob = fh.read()

    assert [e.page_id for e in index] == list(range(len(index)))
    for rg_idx in range(meta.num_row_groups):
        rg = meta.row_group(rg_idx)
        for col_idx in range(rg.num_columns):
            col = rg.column(col_idx)
            mine = [e for e in index if (e.row_group, e.column) == (rg_idx, col_idx)]
            assert sum(e.num_values for e in mine) == col.num_values
            # dict pages carry no global id: first indexed page of the
            # chunk is the first DATA page (footer's data_page_offset
            # points at its header)
            assert mine[0].data_offset - mine[0].header_size == col.data_page_offset

    # spot-check raw reads against the file bytes (shared index: one walk)
    for e in index[:: max(1, len(index) // 7)]:
        assert read_page_data(path, e.page_id, index) == blob[
            e.data_offset : e.data_offset + e.data_size
        ]


def test_read_pages_chunk_cap_semantics(tmp_path):
    """R7 mirrors the reference exactly (parquet_reader.cpp:194-231):
    inclusive page range, cumulative cap, final page TRUNCATED mid-page
    (not dropped) once max_bytes is reached."""
    path = str(tmp_path / "cap.parquet")
    pq.write_table(_table(11, n=600), path, compression="none",
                   use_dictionary=False, data_page_size=256,
                   row_group_size=300)
    index = build_page_index(path)
    assert len(index) >= 6, "fixture must split into many pages"
    full = b"".join(read_page_data(path, i, index) for i in range(3))

    # cap >= total: whole inclusive range [0, 2]
    assert read_pages_chunk(path, 0, 2, 10**9, index) == full
    # cap of exactly the range size: unchanged
    assert read_pages_chunk(path, 0, 2, len(full), index) == full
    # mid-page cap: exact byte prefix, last page truncated not dropped
    cut = index[0].data_size + index[1].data_size // 2
    assert read_pages_chunk(path, 0, 2, cut, index) == full[:cut]
    # cap 0: nothing
    assert read_pages_chunk(path, 0, 2, 0, index) == b""
    # single-page range is read_page_data
    assert read_pages_chunk(path, 4, 4, 10**9, index) == read_page_data(path, 4, index)

    with pytest.raises(IndexError):
        read_pages_chunk(path, 0, len(index), 10, index)
    with pytest.raises(IndexError):
        read_pages_chunk(path, -1, 2, 10, index)
    with pytest.raises(ValueError):
        read_pages_chunk(path, 3, 1, 10, index)


def test_page_iterator_protocol(tmp_path):
    """R8: half-open [start, end), has_next/next/reset, RawPage fields
    (parquet_reader.cpp:242-278)."""
    path = str(tmp_path / "iter.parquet")
    pq.write_table(_table(12, n=500), path, compression="snappy",
                   data_page_size=512, row_group_size=250)
    index = build_page_index(path)
    n = len(index)
    assert n >= 4

    it = PageIterator(path)
    seen = [p for p in it]
    assert [p.page_id for p in seen] == list(range(n))
    assert not it.has_next()
    with pytest.raises(StopIteration):
        it.next()
    # reset replays the identical sequence (including bytes)
    it.reset()
    replay = [p for p in it]
    assert [(p.page_id, p.row_group, p.column, p.data) for p in replay] == [
        (p.page_id, p.row_group, p.column, p.data) for p in seen
    ]
    # RawPage carries the owning chunk and the exact page bytes
    for p in seen:
        e = index[p.page_id]
        assert (p.row_group, p.column) == (e.row_group, e.column)
        assert len(p.data) == e.data_size

    # half-open subrange
    sub = PageIterator(path, 1, 3)
    assert [p.page_id for p in sub] == [1, 2]
    # empty range is legal, like the reference's (k, k) iterator
    assert [p.page_id for p in PageIterator(path, 2, 2)] == []
    with pytest.raises(ValueError):
        PageIterator(path, 3, 1)
    with pytest.raises(IndexError):
        PageIterator(path, 0, n + 1)


def test_read_pages_chunk_property(tmp_path):
    """Property: for ANY (start, end, cap), read_pages_chunk equals the
    cap-truncated concatenation of read_page_data over the inclusive
    range — the executable spec of parquet_reader.cpp:194-231."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis unavailable")
    import os as _os

    path = str(tmp_path / "prop.parquet")
    pq.write_table(_table(13, n=800), path, compression="snappy",
                   data_page_size=300, row_group_size=200)
    index = build_page_index(path)
    n = len(index)
    assert n >= 8
    total = sum(e.data_size for e in index)
    n_examples = 40 * int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def _prop(data):
        start = data.draw(st.integers(0, n - 1))
        end = data.draw(st.integers(start, n - 1))
        cap = data.draw(st.integers(0, total + 7))
        want = b"".join(
            read_page_data(path, i, index) for i in range(start, end + 1)
        )[:cap]
        assert read_pages_chunk(path, start, end, cap, index) == want

    _prop()


def test_header_window_doubles_when_too_small(tmp_path, monkeypatch):
    """_read_header_at must grow its read window until the header parses
    — shrink the initial window to 1 byte and the walk must still return
    byte-identical results (every header exercises the doubling path)."""
    import duckdb_parquet_parser_spark.inspect as insp

    path = str(tmp_path / "w.parquet")
    pq.write_table(_table(21, n=400), path, compression="snappy",
                   data_page_size=512, row_group_size=200)
    normal = walk_pages(path)
    monkeypatch.setattr(insp, "_HEADER_READ_SIZE", 1)
    assert walk_pages(path) == normal and len(normal) > 4
