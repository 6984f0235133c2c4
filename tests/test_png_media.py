"""Real compressed-format decode through the codec seam (VERDICT r12
missing #2): the pure-stdlib PNG decoder's unit contracts (round-trip
across every filter type and awkward geometries, corrupt-stream
loudness) and the certified query's local differential gate."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_parquet_parser_spark.operators.multimodal import average_hash
from duckdb_parquet_parser_spark.operators.multimodal_synth import (
    image_hash_for_doc,
)
from duckdb_parquet_parser_spark.operators.png_media import (
    ORACLES,
    PNG_MAGIC,
    PNG_POISON_MOD,
    PNG_TRUNC_MOD,
    QUERIES,
    _png_payload,
    decode_png,
    encode_png,
)
from duckdb_parquet_parser_spark.testing import compare_query


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_png_features_match_oracle(spark, sf_dir):
    res = compare_query(
        spark,
        sf_dir,
        "ns_mm_png_features",
        QUERIES["ns_mm_png_features"],
        ORACLES["ns_mm_png_features"],
    )
    assert res.ok, res


@pytest.mark.parametrize("shape", [(8, 8), (13, 7), (1, 1), (5, 32), (3, 3)])
@pytest.mark.parametrize("filt", [None, 0, 1, 2, 3, 4, [4, 2, 1]])
def test_png_roundtrip_every_filter(shape, filt):
    """encode→decode is the identity for RGB images under each PNG
    filter type individually AND the cycling default — awkward widths
    catch stride/left-neighbor bugs (the first pixel of a row has no
    left, the first row no up)."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filters=filt))
    assert out.shape == (*shape, 3)
    assert (out == img).all()


def test_png_grayscale_replicates_to_rgb():
    g = np.arange(54, dtype=np.uint8).reshape(6, 9)
    out = decode_png(encode_png(g))
    assert out.shape == (6, 9, 3)
    assert (out[..., 0] == g).all() and (out[..., 2] == g).all()


def test_png_corrupt_streams_are_loud():
    """Bit flips, truncation and bad signatures must raise the degrade
    contract's exception types (ValueError), never decode silently."""
    g = np.full((4, 4), 7, dtype=np.uint8)
    png = bytearray(encode_png(g))
    png[60] ^= 0x40  # inside IDAT -> chunk CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(encode_png(g)[:40])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + encode_png(g))


def test_png_unsupported_shapes_hit_the_boundary():
    """16-bit / palette / interlaced PNGs raise NotImplementedError —
    the documented codec boundary, one degrade row downstream."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    payload = PNG_MAGIC + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(payload)


def test_png_payload_species():
    """The corpus's three species: real PNG whose decoded aHash equals
    the closed form, GIF poison, truncated-PNG poison."""
    for d in (1, 2, 5, 100, 254, 255, 300, 1000):
        if d % PNG_POISON_MOD == 0 or d % PNG_TRUNC_MOD == 0:
            continue
        assert average_hash(decode_png(_png_payload(d))) == (
            image_hash_for_doc(d)
        ), d
    assert _png_payload(PNG_POISON_MOD * 3)[:6] == b"GIF89a"
    trunc = _png_payload(PNG_TRUNC_MOD)
    assert trunc[:8] == PNG_MAGIC
    with pytest.raises(ValueError):
        decode_png(trunc)
