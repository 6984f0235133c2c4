"""fs_content_fingerprint (fsmeta.py) — the round-16 staged primitive
behind REVIEW_r14.md #2: fingerprints must change when content changes,
work on directories and single files, accept scheme-qualified URIs, and
REFUSE absent paths (the empty-fingerprint silent-staleness hole is the
bug this replaces)."""

from __future__ import annotations

import os
import time

import pytest

from duckdb_parquet_parser_spark.fsmeta import fs_content_fingerprint


def test_fingerprint_single_file_and_rewrite(spark, tmp_path):
    f = tmp_path / "docs.parquet"
    f.write_bytes(b"abc")
    fp1 = fs_content_fingerprint(spark, str(f))
    assert "docs.parquet:" in fp1 and fp1.endswith(":3")
    # size change must change the fingerprint
    f.write_bytes(b"abcdef")
    fp2 = fs_content_fingerprint(spark, str(f))
    assert fp2 != fp1 and fp2.endswith(":6")
    # same-size rewrite: mtime moves (Hadoop reports ms — force a tick)
    time.sleep(0.002)
    f.write_bytes(b"uvwxyz")
    os.utime(f)
    fp3 = fs_content_fingerprint(spark, str(f))
    assert fp3 != fp2


def test_fingerprint_directory_listing(spark, tmp_path):
    d = tmp_path / "docs.parquet"
    (d / "part").mkdir(parents=True)
    (d / "a.parquet").write_bytes(b"1" * 5)
    (d / "part" / "b.parquet").write_bytes(b"2" * 7)
    fp = fs_content_fingerprint(spark, str(d))
    names = sorted(seg.split(":")[0] for seg in fp.split("|"))
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
