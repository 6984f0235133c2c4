"""Multimodal (binary) columns — north-star extension (SURVEY.md §2.5).

Model: media ride as opaque ``binary`` payload columns with a typed
metadata struct beside them; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (the only sane Python boundary). The
image/audio codecs are NOT in this container, so the codec call itself is
stubbed (`decode_image` raises NotImplementedError); the Spark-side
plumbing — schema, batching, UDF signature — is real and tested, with a
deterministic byte-level feature extractor standing in for the codec.

Scale design: mapInPandas streams Arrow record batches, so executor memory
is bounded by batch size, not partition size; payload columns are pruned
unless requested (binary column stays columnar in Parquet).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, last_byte int"
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct): the multimodal
    column layout. Payload = utf-8 bytes of text (deterministic stand-in
    for an image/audio blob)."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("content_length"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """STUB: real image decode requires PIL/libvips, not in this container.

    The surrounding Spark plumbing (binary column → mapInPandas → feature
    rows) is real; swap this function's body for an actual codec call in a
    full deployment.
    """
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL); "
        "not available in this environment"
    )


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column —
    the mapInPandas pattern a real decoder plugs into."""
    import pandas as pd

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "last_byte": payload.map(lambda b: b[-1] if len(b) else -1).astype(
                        "int32"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(features, FEATURE_SCHEMA)


def q_ns_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the multimodal table (pure JVM)."""
    media = build_media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.content_length").alias("content_length"),
        F.col("meta.origin").alias("origin"),
    )


def q_ns_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-feature extraction through the real mapInPandas decode path."""
    return extract_byte_features(build_media_table(spark, sf_dir))


FRAME_BYTES = 32  # fixed-size "frame" of the payload
FRAME_STRIDE = 4  # keep every 4th frame


def q_ns_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat the payload as fixed-size frames, keep every
    STRIDE-th frame (the video-keyframe / audio-window subsample pattern).
    Pure JVM: sequence → transform → filter on the binary column; a real
    decoder would replace the substring with a codec frame extraction."""
    media = build_media_table(spark, sf_dir)
    n_frames = F.ceil(F.octet_length("payload") / F.lit(FRAME_BYTES)).cast(
        "int"
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(
                F.col("payload").cast("string"), i * FRAME_BYTES + 1, FRAME_BYTES
            ).alias("frame"),
        ),
    )
    sampled = F.filter(frames, lambda fr: fr["frame_idx"] % FRAME_STRIDE == 0)
    return (
        media.select("doc_id", F.explode(sampled).alias("fr"))
        .select(
            "doc_id",
            F.col("fr.frame_idx").alias("frame_idx"),
            F.length("fr.frame").cast("long").alias("frame_len"),
            F.md5(F.encode("fr.frame", "utf-8")).alias("frame_md5"),
        )
    )


QUERIES = {
    "ns_mm_meta": q_ns_mm_meta,
    "ns_mm_features": q_ns_mm_features,
    "ns_mm_framesample": q_ns_mm_framesample,
}

ORACLES = {
    "ns_mm_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               'text/plain' AS mime,
               n_chars AS content_length,
               source AS origin
        FROM documents
    """,
    "ns_mm_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
               CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte
        FROM documents
    """,
    "ns_mm_framesample": f"""
        WITH f AS (
            SELECT doc_id,
                   unnest(range(0, CAST(ceil(octet_length(encode(text))
                       / {FRAME_BYTES}.0) AS BIGINT))) AS frame_idx,
                   text
            FROM documents
        )
        SELECT doc_id,
               CAST(frame_idx AS INT) AS frame_idx,
               CAST(length(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT),
                   {FRAME_BYTES})) AS BIGINT) AS frame_len,
               md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT),
                   {FRAME_BYTES})) AS frame_md5
        FROM f WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
}
