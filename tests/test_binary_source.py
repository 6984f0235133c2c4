"""Raw-file (binaryFile) ingestion → multimodal layout
(sources/binary.py): content round-trips byte-exact, listing-time glob
pruning works, and the ingested frame composes with the multimodal
mapInPandas feature extractor unchanged."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from duckdb_parquet_parser_spark.operators.multimodal import (
    extract_byte_features,
)
from duckdb_parquet_parser_spark.sources.binary import (
    ingest_binary_dir,
    ingest_to_media_parquet,
)

PAYLOADS = {
    "a.txt": b"hello multimodal",
    "b.jpg": bytes(range(256)),
    "c.bin": b"\x00",  # single NUL byte: binary edge without being empty
}


def _write_files(d):
    for name, data in PAYLOADS.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)


def test_ingest_round_trips_bytes_and_meta(spark, tmp_path):
    _write_files(tmp_path)
    df = ingest_binary_dir(spark, str(tmp_path))
    rows = {r["file_name"]: r for r in df.collect()}
    assert set(rows) == set(PAYLOADS)
    for name, data in PAYLOADS.items():
        assert bytes(rows[name]["payload"]) == data
        assert rows[name]["meta"]["content_length"] == len(data)
    assert rows["a.txt"]["meta"]["mime"] == "text/plain"
    assert rows["b.jpg"]["meta"]["mime"] == "image/jpeg"
    assert rows["c.bin"]["meta"]["mime"] == "application/octet-stream"


def test_zero_byte_files_are_skipped_by_the_listing(spark, tmp_path):
    """Source semantic worth pinning: Spark's file listing produces no
    split for a ZERO-length file, so empty blobs silently don't ingest —
    a pipeline that must represent them needs a manifest row, not a raw
    empty file (documented in sources/binary.py)."""
    _write_files(tmp_path)
    open(tmp_path / "empty.bin", "wb").close()
    df = ingest_binary_dir(spark, str(tmp_path))
    assert "empty.bin" not in {r["file_name"] for r in df.collect()}


def test_glob_prunes_at_listing_time(spark, tmp_path):
    _write_files(tmp_path)
    df = ingest_binary_dir(spark, str(tmp_path), glob="*.txt")
    assert [r["file_name"] for r in df.collect()] == ["a.txt"]
    # the pruning happens in the file LISTING: the scan's input files
    # must not even include the non-matching paths
    assert all(f.endswith("a.txt") for f in df.inputFiles())


def test_ingested_frame_feeds_multimodal_features(spark, tmp_path):
    _write_files(tmp_path)
    out = str(tmp_path / "media_parquet")
    media = ingest_to_media_parquet(spark, str(tmp_path), out).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    feats = {
        r["doc_id"]: r
        for r in extract_byte_features(media).collect()
    }
    by_name = {
        r["doc_id"]: r["file_name"] for r in media.collect()
    }
    for doc_id, row in feats.items():
        data = PAYLOADS[by_name[doc_id]]
        assert row["n_bytes"] == len(data)
        assert row["first_byte"] == (data[0] if data else -1)
        assert row["last_byte"] == (data[-1] if data else -1)
