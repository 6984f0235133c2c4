"""Staged r17 video frame-hash artifact (operators/staged_r17_video.py):
write → validated read must round-trip the decode output exactly, reuse
without rewrite, and reject version/stride mismatches before any data."""

from __future__ import annotations

import json

import pytest

from duckdb_parquet_parser_spark.operators.multimodal import (
    VIDEO_FRAME_STRIDE,
    extract_video_frame_hashes,
)
from duckdb_parquet_parser_spark.operators.multimodal_synth import (
    build_video_table,
)
from duckdb_parquet_parser_spark.operators.staged_r17_video import (
    read_frames_artifact,
    write_frames_artifact,
)


def test_frames_artifact_roundtrip_and_contract(spark, sf_smoke, tmp_path):
    uri = f"file://{tmp_path}/vframes"
    write_frames_artifact(spark, sf_smoke, uri)
    got = {
        (r["doc_id"], r["frame_idx"], r["ahash"])
        for r in read_frames_artifact(spark, uri).collect()
    }
    want = {
        (r["doc_id"], r["frame_idx"], r["ahash"])
        for r in extract_video_frame_hashes(
            build_video_table(spark, sf_smoke)
        ).collect()
    }
    assert got == want and want

    # stride mismatch → loud rejection before data
    with pytest.raises(ValueError, match="stride"):
        read_frames_artifact(spark, uri, stride=VIDEO_FRAME_STRIDE + 1)

    # version bump → loud rejection (sidecar rewritten through the
    # Hadoop path so the LocalFileSystem .crc stays consistent)
    from duckdb_parquet_parser_spark.operators.dedup import (
        _artifact_meta_path,
        _fs_move_text_into_place,
    )

    _fs_move_text_into_place(
        spark,
        _artifact_meta_path(uri),
        json.dumps({"frames_version": 999, "stride": VIDEO_FRAME_STRIDE}),
    )
    with pytest.raises(ValueError, match="version"):
        read_frames_artifact(spark, uri)


def test_ensure_writes_once_then_reuses(spark, sf_smoke, tmp_path, monkeypatch):
    """ensure_frames_artifact: first call writes (no sidecar yet), second
    call reuses the SAME files — the droprate/incremental-persisted
    ensure convention applied to media."""
    import glob
    import os

    import duckdb_parquet_parser_spark.operators.staged_r17_video as s17

    uri_dir = str(tmp_path / "vframes_ensure")
    monkeypatch.setattr(
        s17, "frames_artifact_path", lambda sf_dir: uri_dir
    )
    got1 = s17.ensure_frames_artifact(spark, sf_smoke).collect()
    files1 = sorted(glob.glob(os.path.join(uri_dir, "*.parquet")))
    got2 = s17.ensure_frames_artifact(spark, sf_smoke).collect()
    files2 = sorted(glob.glob(os.path.join(uri_dir, "*.parquet")))
    assert files1 and files1 == files2
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))


def test_neardup_via_artifact_matches_live_decode(spark, sf_smoke, tmp_path, monkeypatch):
    """The r17 swap's equivalence claim, Spark-vs-Spark: the registered
    video near-dup and dedup-cluster queries (artifact-fed) reproduce the
    live-decode pipeline exactly. The driver hash match re-proves this
    against the closed-form oracle; this pins it against the PREVIOUS
    certified plan as well."""
    from duckdb_parquet_parser_spark.operators.multimodal import (
        video_neardup_pairs,
    )
    from duckdb_parquet_parser_spark.operators.multimodal_dedup import (
        q_ns_mm_video_dedup_cluster,
    )
    from duckdb_parquet_parser_spark.operators.multimodal_synth import (
        build_video_table,
        q_ns_mm_video_neardup,
    )
    import duckdb_parquet_parser_spark.operators.staged_r17_video as s17

    monkeypatch.setattr(
        s17,
        "frames_artifact_path",
        lambda sf_dir: str(tmp_path / "vframes_q"),
    )
    live = video_neardup_pairs(build_video_table(spark, sf_smoke)).collect()
    via_artifact = q_ns_mm_video_neardup(spark, sf_smoke).collect()
    assert sorted(map(tuple, via_artifact)) == sorted(map(tuple, live))
    assert live  # non-vacuous: the fixture has near-dup pairs

    clusters = q_ns_mm_video_dedup_cluster(spark, sf_smoke).collect()
    assert clusters
    docs = {r["doc_id"] for r in clusters}
    paired = {r["doc_a"] for r in live} | {r["doc_b"] for r in live}
    assert docs == paired
