"""fs_content_fingerprint (fsmeta.py) — the round-16 staged primitive
behind REVIEW_r14.md #2: fingerprints must change when content changes,
work on directories and single files, accept scheme-qualified URIs, and
REFUSE absent paths (the empty-fingerprint silent-staleness hole is the
bug this replaces)."""

from __future__ import annotations

import os

import pytest

from duckdb_parquet_parser_spark.fsmeta import fs_content_fingerprint


def test_fingerprint_single_file_and_rewrite(spark, tmp_path):
    f = tmp_path / "docs.parquet"
    f.write_bytes(b"abc")
    fp1 = fs_content_fingerprint(spark, str(f))
    # length-prefixed record (ADVICE r14): len(rel):rel:mtime:size
    assert "12:docs.parquet:" in fp1 and fp1.endswith(":3")
    # size change must change the fingerprint
    f.write_bytes(b"abcdef")
    fp2 = fs_content_fingerprint(spark, str(f))
    assert fp2 != fp1 and fp2.endswith(":6")
    # same-size rewrite: set a DISTINCT mtime explicitly instead of
    # sleeping past the clock tick — on coarse-mtime filesystems (1 s on
    # some network mounts) a 2 ms sleep can land the rewrite in the same
    # Hadoop-visible millisecond and flake (ADVICE r14)
    st = f.stat()
    f.write_bytes(b"uvwxyz")
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000))
    fp3 = fs_content_fingerprint(spark, str(f))
    assert fp3 != fp2


def test_fingerprint_delimiter_paths_cannot_alias(spark, tmp_path):
    """Length-prefixed records (ADVICE r14): a relative path containing
    the ':' or '|' delimiters must parse unambiguously — two different
    listings can never join to the same fingerprint string."""
    d = tmp_path / "t.parquet"
    d.mkdir()
    (d / "a:1").write_bytes(b"x")
    fp = fs_content_fingerprint(spark, str(d))
    # the record self-describes the path length, so the embedded ':'
    # cannot shift field boundaries
    assert fp.startswith("3:a:1:")
    (d / "a|b").write_bytes(b"y")
    fp2 = fs_content_fingerprint(spark, str(d))
    assert fp2 != fp and "3:a|b:" in fp2


def test_fingerprint_directory_listing(spark, tmp_path):
    d = tmp_path / "docs.parquet"
    (d / "part").mkdir(parents=True)
    (d / "a.parquet").write_bytes(b"1" * 5)
    (d / "part" / "b.parquet").write_bytes(b"2" * 7)
    fp = fs_content_fingerprint(spark, str(d))

    def rel_of(seg: str) -> str:
        n, rest = seg.split(":", 1)
        return rest[: int(n)]

    names = sorted(rel_of(seg) for seg in fp.split("|"))
    # recursive listing with RELATIVE paths, not basenames — a
    # same-name part file in two partition directories must produce
    # two distinct keys (code review r14)
    assert names == ["a.parquet", "part/b.parquet"]
    # adding a file changes the fingerprint
    (d / "c.parquet").write_bytes(b"3")
    assert fs_content_fingerprint(spark, str(d)) != fp


def test_fingerprint_sees_cross_directory_moves(spark, tmp_path):
    """A same-name/same-size/same-mtime move between partition
    directories must change the fingerprint — the exact blind spot a
    basename key would have (code review r14)."""
    import shutil

    d = tmp_path / "t.parquet"
    (d / "lang=en").mkdir(parents=True)
    (d / "lang=fr").mkdir()
    f = d / "lang=en" / "part-00000.parquet"
    f.write_bytes(b"xyz")
    fp1 = fs_content_fingerprint(spark, str(d))
    st = f.stat()
    shutil.move(str(f), str(d / "lang=fr" / "part-00000.parquet"))
    os.utime(
        d / "lang=fr" / "part-00000.parquet",
        ns=(st.st_atime_ns, st.st_mtime_ns),
    )
    fp2 = fs_content_fingerprint(spark, str(d))
    assert fp1 != fp2


def test_fingerprint_accepts_file_uri(spark, tmp_path):
    f = tmp_path / "t.bin"
    f.write_bytes(b"xy")
    plain = fs_content_fingerprint(spark, str(f))
    uri = fs_content_fingerprint(spark, f"file://{f}")
    assert plain == uri


def test_fingerprint_absent_path_raises(spark, tmp_path):
    """The whole point vs the os.stat version: a path the FS can't see
    must be LOUD, never the empty string that aliases every content
    version (REVIEW_r14.md #2)."""
    with pytest.raises(FileNotFoundError):
        fs_content_fingerprint(spark, str(tmp_path / "nope.parquet"))
