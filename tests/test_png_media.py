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


def test_png_wrong_length_ihdr_is_the_deliberate_error():
    """A 12- or 14-byte IHDR behind a valid CRC must fail with the
    explicit length message, not struct.error (review r14 — the same
    valid-header-unreachable-by-flips blind spot as the GIF mcs bound,
    ADVICE r13)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    for n in (0, 12, 14):
        payload = (
            PNG_MAGIC + chunk(b"IHDR", b"\x00" * n) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="IHDR length"):
            decode_png(payload)


def test_png_decoder_fuzz_contract():
    """The triad fuzz contract extended to the plugin decoder: on
    arbitrary or adversarial bytes, decode_png raises ONLY ValueError or
    NotImplementedError (the kernel's degrade set) — never IndexError /
    struct.error / zlib bombs / absurd allocation. The decompression cap
    makes an expansion bomb cost one over-read byte, not the expansion."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(11)
    payloads = [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
        for n in (0, 1, 8, 13, 64, 4096)
    ]
    # adversarial: valid magic with hostile bodies
    ihdr_huge = struct.pack(">IIBBBBB", 2**31 - 1, 2**31 - 1, 8, 2, 0, 0, 0)
    ihdr_zero = struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0)
    ihdr_ok = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(bytes(50_000_000), 9)  # ~48 KB -> 50 MB
    payloads += [
        PNG_MAGIC,  # magic only
        PNG_MAGIC + b"\xff\xff\xff\xff" + b"IHDR",  # lying chunk length
        PNG_MAGIC + chunk(b"IHDR", ihdr_huge) + chunk(b"IEND", b""),
        PNG_MAGIC + chunk(b"IHDR", ihdr_zero) + chunk(b"IEND", b""),
        PNG_MAGIC + chunk(b"IHDR", ihdr_ok)
        + chunk(b"IDAT", b"not zlib") + chunk(b"IEND", b""),
        # decompression bomb behind a well-formed 4x4 header
        PNG_MAGIC + chunk(b"IHDR", ihdr_ok)
        + chunk(b"IDAT", bomb) + chunk(b"IEND", b""),
        # garbage filter byte on an otherwise valid raster
        PNG_MAGIC + chunk(b"IHDR", ihdr_ok)
        + chunk(b"IDAT", zlib.compress(b"\x07" + bytes(4) * 5))
        + chunk(b"IEND", b""),
        # missing IHDR
        PNG_MAGIC + chunk(b"IEND", b""),
        # wrong-length IHDR with a VALID CRC (review r14): byte-flips
        # can never produce this (a flipped length field breaks the CRC
        # first), and before the explicit length check it raised
        # struct.error — outside the degrade set
        PNG_MAGIC + chunk(b"IHDR", b"\x00" * 12) + chunk(b"IEND", b""),
        PNG_MAGIC + chunk(b"IHDR", b"\x00" * 14) + chunk(b"IEND", b""),
    ]
    # mutated valid PNGs: every byte position flipped once
    base = encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    for i in range(len(base)):
        m = bytearray(base)
        m[i] ^= 0xFF
        payloads.append(bytes(m))
    decoded, degraded = 0, 0
    for p in payloads:
        try:
            img = decode_png(p)
            assert img.shape[2] == 3 and str(img.dtype) == "uint8"
            decoded += 1
        except (ValueError, NotImplementedError):
            degraded += 1
    # every payload hit exactly one of the two contract outcomes
    assert decoded + degraded == len(payloads)
    assert degraded > len(payloads) - 10  # nearly all must degrade
