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
