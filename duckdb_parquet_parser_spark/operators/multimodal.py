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


QUERIES = {
    "ns_mm_meta": q_ns_mm_meta,
    "ns_mm_features": q_ns_mm_features,
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
}
