"""Second real compressed format through the codec seam
(operators/gif_media.py): LZW round-trip contracts (including the
width-growth and 4096-entry-CLEAR paths the 8×8 fixtures can't reach),
the hand-decodable KwKwK case, corrupt-stream loudness, the triad fuzz
contract, and magic-prefix independence from the certified PNG corpus
(whose poison species is GIF89a — this codec must never claim it)."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_parquet_parser_spark.operators.gif_media import (
    GIF87A_MAGIC,
    GIF_POISON_MOD,
    GIF_TRUNC_MOD,
    _gif_payload,
    decode_gif,
    encode_gif,
)
from duckdb_parquet_parser_spark.operators.multimodal import average_hash
from duckdb_parquet_parser_spark.operators.multimodal_synth import (
    image_hash_for_doc,
)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (1, 7), (8, 8), (3, 255), (40, 41), (13, 2)],
)
def test_gif_roundtrip_geometries(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (*shape, 3)
    for c in range(3):
        assert (out[..., c] == img).all()


def test_gif_lzw_width_growth_and_table_overflow():
    """40×41 random forces the 9→10-bit width bump (>512 entries);
    80×80 random crosses the 4096-entry table and exercises the
    explicit CLEAR/reset path on both sides."""
    rng = np.random.RandomState(3)
    for shape in ((40, 41), (80, 80)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert (decode_gif(encode_gif(img))[..., 0] == img).all()


def test_gif_kwkwk_case():
    """A constant image immediately hits the code == next_free (KwKwK)
    decoder branch; also hand-checkable at width 9 with no growth."""
    img = np.full((4, 4), 9, np.uint8)
    assert (decode_gif(encode_gif(img))[..., 0] == img).all()


def test_gif_payload_species():
    """The corpus's three species: real GIF87a whose decoded aHash
    equals the closed form, GIF89a poison (the PNG corpus's species —
    NEVER claimed by this codec), truncated GIF87a."""
    for d in (1, 2, 5, 100, 254, 255, 300, 1000):
        if d % GIF_POISON_MOD == 0 or d % GIF_TRUNC_MOD == 0:
            continue
        assert average_hash(decode_gif(_gif_payload(d))) == (
            image_hash_for_doc(d)
        ), d
    assert _gif_payload(GIF_POISON_MOD * 3)[:6] == b"GIF89a"
    with pytest.raises(NotImplementedError):
        decode_gif(_gif_payload(GIF_POISON_MOD * 3))
    trunc = _gif_payload(GIF_TRUNC_MOD)
    assert trunc[:6] == GIF87A_MAGIC
    with pytest.raises(ValueError):
        decode_gif(trunc)


def test_gif_scope_boundaries_are_loud():
    base = encode_gif(np.zeros((4, 4), np.uint8))
    # interlace flag set in the image descriptor
    idesc_at = 6 + 7 + 768  # header + LSD + GCT
    interlaced = bytearray(base)
    interlaced[idesc_at + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(interlaced))
    # local color table flag
    local = bytearray(base)
    local[idesc_at + 9] |= 0x80
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(local))
    # no global color table
    nogct = bytearray(base)
    nogct[10] &= 0x7F
    with pytest.raises((NotImplementedError, ValueError)):
        decode_gif(bytes(nogct))


def test_codec_coexistence_with_certified_png(spark, sf_smoke):
    """Registering the GIF87a codec must not perturb the CERTIFIED
    ns_mm_png_features answers: its poison species is GIF89a, which
    this codec's full-6-byte magic deliberately never claims. Worst
    case ordering (GIF registered before the PNG plan builds) both
    queries stay oracle-identical in one session."""
    from duckdb_parquet_parser_spark.operators.gif_media import (
        ORACLES as GO,
        QUERIES as GQ,
    )
    from duckdb_parquet_parser_spark.operators.png_media import (
        ORACLES as PO,
        QUERIES as PQ,
    )
    from duckdb_parquet_parser_spark.testing import compare_query

    r1 = compare_query(
        spark, sf_smoke, "ns_mm_gif_features",
        GQ["ns_mm_gif_features"], GO["ns_mm_gif_features"],
    )
    assert r1.ok, r1
    r2 = compare_query(
        spark, sf_smoke, "ns_mm_png_features",
        PQ["ns_mm_png_features"], PO["ns_mm_png_features"],
    )
    assert r2.ok, r2


def test_gif_decoder_fuzz_contract():
    """Arbitrary/adversarial bytes → ONLY ValueError or
    NotImplementedError (the kernel's degrade set); an LZW stream
    longer than the declared frame costs a ValueError, not an
    allocation."""
    import struct

    rng = np.random.default_rng(13)
    payloads = [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
        for n in (0, 1, 6, 13, 64, 4096)
    ]
    lsd = struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0)
    gct = bytes(768)
    payloads += [
        GIF87A_MAGIC,  # magic only
        GIF87A_MAGIC + lsd,  # table truncated
        GIF87A_MAGIC + lsd + gct,  # no blocks at all
        GIF87A_MAGIC + lsd + gct + b"\x3b",  # trailer before image
        GIF87A_MAGIC + lsd + gct + b"\x99",  # unknown block
        # hostile dimensions
        GIF87A_MAGIC
        + struct.pack("<HHBBB", 0xFFFF, 0xFFFF, 0xF7, 0, 0)
        + gct
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 0xFFFF, 0xFFFF, 0)
        + b"\x08\x00\x3b",
        # declared 4x4 but an LZW stream emitting far more pixels:
        # literal root codes under repeated CLEARs never end
        GIF87A_MAGIC + lsd + gct
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
        + b"\x08"
        + bytes([255]) + bytes([0x00] * 255)  # 9-bit zeros: code 0 x N
        + bytes([255]) + bytes([0x00] * 255)
        + b"\x00\x3b",
    ]
    # LZW min code size 9-11: representable in the byte but outside
    # GIF's spec cap of 8 — must hit the deliberate range check, not an
    # incidental error deeper in the table build (ADVICE r13; byte-flips
    # of the valid 0x08 can't produce these values)
    for mcs in (9, 10, 11):
        payloads.append(
            GIF87A_MAGIC + lsd + gct
            + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
            + bytes([mcs]) + b"\x01\x00\x00\x3b"
        )
    base = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for i in range(len(base)):
        m = bytearray(base)
        m[i] ^= 0xFF
        payloads.append(bytes(m))
    ok = 0
    for p in payloads:
        try:
            img = decode_gif(p)
            assert img.ndim == 3 and img.dtype == np.uint8
            ok += 1
        except (ValueError, NotImplementedError):
            pass
    # a few single-byte flips (e.g. inside the palette) still decode —
    # that's fine; the contract is the exception SET, not rejection
    assert ok < len(payloads)


def test_gif_mcs_over_cap_is_the_deliberate_range_error():
    """mcs 9-11 must fail with the scope-check message, not whatever
    exception the literal-table build happens to raise (ADVICE r13:
    before the tight bound, bytes([i]) past 255 produced an incidental
    ValueError whose text promised nothing)."""
    import struct

    lsd = struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0)
    for mcs in (9, 10, 11):
        payload = (
            GIF87A_MAGIC + lsd + bytes(768)
            + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
            + bytes([mcs]) + b"\x01\x00\x00\x3b"
        )
        with pytest.raises(ValueError, match="min code size.*out of range"):
            decode_gif(payload)
