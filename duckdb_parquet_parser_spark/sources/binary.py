"""Raw-file ingestion: a directory of opaque media/blob files → the
engine's multimodal column layout (SURVEY §2.5; sources family).

Spark's built-in ``binaryFile`` source reads each file as one row of
``(path, modificationTime, length, content binary)`` — the missing first
step before the multimodal operators (operators/multimodal.py), which all
start from a table that already HAS a payload column. ``ingest_binary_dir``
bridges the two: point it at a directory (any Hadoop-reachable scheme) and
it returns rows in the same ``(payload, meta struct)`` shape
``build_media_table`` produces, so ``extract_byte_features`` /
frame-sampling run on real files unchanged (tests/test_binary_source.py).

Scale notes (100 TB of media):
- one file = one row = one task unit; parallelism is the file count, and
  the scan is listed through the same FileIndex machinery as parquet
  (``recursiveFileLookup`` for nested layouts, ``pathGlobFilter`` for
  server-side suffix pruning — pushed into the LISTING, so a filter to
  ``*.jpg`` never even stats the other files);
- ``spark.sql.sources.binaryFile.maxLength`` caps per-file memory; blobs
  beyond executor budget belong in chunked storage, not a row;
- ZERO-length files produce no scan split and silently don't ingest
  (FileIndex semantics, pinned in tests); represent empty blobs as
  manifest rows, not raw empty files;
- the natural pipeline is ingest → write parquet with the payload as a
  binary column (columnar, pruned unless projected) → run the multimodal
  operators off the parquet, not off the raw directory, so repeated
  queries pay the small-file listing exactly once. That is what
  ``ingest_to_media_parquet`` does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → mime for the metadata struct; unknown extensions fall back
# to application/octet-stream (the payload is opaque either way)
_MIME = {
    "txt": "text/plain",
    "json": "application/json",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "parquet": "application/vnd.apache.parquet",
}


def _mime_expr(path_col):
    ext = F.lower(F.element_at(F.split(path_col, r"\."), -1))
    expr = F.lit("application/octet-stream")
    for k, v in _MIME.items():
        expr = F.when(ext == k, F.lit(v)).otherwise(expr)
    return expr


def ingest_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read every file under ``path`` as one multimodal row:
    ``(file_name, payload binary, meta struct(mime, content_length,
    origin, modified))``. ``glob`` prunes at LISTING time
    (``pathGlobFilter``); ``recursive`` walks nested directories."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    return raw.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("content").alias("payload"),
        F.struct(
            _mime_expr(F.col("path")).alias("mime"),
            F.col("length").cast("long").alias("content_length"),
            F.col("path").alias("origin"),
            F.col("modificationTime").alias("modified"),
        ).alias("meta"),
    )


def ingest_to_media_parquet(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest raw files once and land them as a parquet media table —
    the write-once/read-many layout the multimodal operators should run
    from (payload stays a columnar binary column, pruned unless
    projected). Returns the re-read parquet frame."""
    ingest_binary_dir(spark, src_dir, glob=glob, recursive=recursive).write.mode(
        "overwrite"
    ).parquet(out_path)
    return spark.read.parquet(out_path)
