"""REAL compressed-image decode through the codec plug seam: a
pure-stdlib PNG decoder (zlib inflate + per-row defilter, implemented
from the public W3C PNG specification / RFC 2083) registered via
``media_codecs.register_codec`` and certified end-to-end as
``ns_mm_png_features`` (VERDICT r12 missing #2).

Why this matters: the engine's documented codec boundary said
"compressed formats need entropy decoders that aren't in this
container" — true for JPEG/WebP (DCT/VP8), but PNG's entropy coder IS
in the container: DEFLATE via ``zlib``. So one real compressed format
can cross the boundary with zero new dependencies, which upgrades the
boundary claim from "proven pluggable with a toy codec" (round 12) to
"carrying real compressed bytes in a certified query every round".

Decoder scope (documented, loud): 8-bit depth, color types 0
(grayscale) and 2 (RGB), non-interlaced — the shapes this corpus emits.
16-bit, palette, alpha and Adam7 raise ``NotImplementedError`` (degrade
row, never a task failure); corrupt streams (bad chunk CRC, truncated
raster, bad magic) raise ``ValueError``. All five PNG filter types
(None/Sub/Up/Average/Paeth) are implemented and EXERCISED: the encoder
cycles the filter by row index, so every fixture image decodes through
every filter path in every driver round. The per-row defilter is
sequential Python over row bytes — fine inside the Arrow-batched
``mapInPandas`` kernel at fixture sizes; a production deployment
registers libpng/PIL through the same seam for throughput (the seam
contract, not the decoder, is the scale surface).

Corpus: the SAME closed-form two-level 8×8 images as the certified
PPM/BMP corpus (multimodal_synth.image_hash_for_doc), PNG-encoded — so
dimensions, channel means and the 64-bit aHash keep their closed-form
DuckDB oracle. Two poison species certify both degrade paths through
the plugin seam: a GIF-magic payload (no codec claims it → the built-in
decode raises ``NotImplementedError``) and a TRUNCATED PNG (the plugin
itself raises ``ValueError`` mid-decode) — every
``PNG_POISON_MOD``-th / ``PNG_TRUNC_MOD``-th doc respectively.

Scale shape: identical to the certified ns_mm_image_features plan — one
pruned single-column doc_id scan, one Arrow-batched mapInPandas for the
payload build, one for decode+features; no shuffle at all.

Reference analog: none — the reference has no media surface; the PNG
layouts are public knowledge (W3C PNG spec §§ 5, 9, 11; zlib RFC 1950).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .media_codecs import extract_image_features_via, register_codec
from .multimodal_synth import (
    _IMG_HASH_CTE,
    _IMG_K,
    _SIGNED64,
    _payload_builder,
    _plane_from_hash,
    image_hash_for_doc,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
PNG_MAX_PIXELS = 64 * 1024 * 1024  # hostile-header decode bound (fuzz)
PNG_POISON_MOD = 23  # doc_id % 23 == 0 -> GIF-magic payload (no codec)
PNG_TRUNC_MOD = 29  # doc_id % 29 == 0 -> truncated PNG (plugin ValueError)

_POISON_GIF = b"GIF89a" + b"\x00" * 26


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec § 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties resolved left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img, filters=None) -> bytes:
    """HxWx3 uint8 (or HxW gray) → PNG bytes, pure stdlib.

    ``filters`` picks the per-row filter type: None (default) cycles
    ``row % 5`` so a multi-row image exercises every filter path in the
    decoder — the fixture generator's whole point; pass a list/int to
    pin specific types (tests do)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ch = 1 if gray else arr.shape[2]
    if ch not in (1, 3):
        raise ValueError(f"encode_png: {ch}-channel input")
    raw = arr.reshape(h, w * ch).astype(np.int16)
    lines = bytearray()
    for y in range(h):
        ft = (
            y % 5
            if filters is None
            else (filters[y % len(filters)] if hasattr(filters, "__len__") else filters)
        )
        cur = raw[y]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up = raw[y - 1] if y > 0 else np.zeros(w * ch, np.int16)
        upleft = (
            np.concatenate([np.zeros(ch, np.int16), up[:-ch]])
            if y > 0
            else np.zeros(w * ch, np.int16)
        )
        if ft == 0:
            out = cur
        elif ft == 1:
            out = cur - left
        elif ft == 2:
            out = cur - up
        elif ft == 3:
            out = cur - (left + up) // 2
        elif ft == 4:
            pred = np.fromiter(
                (
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, up, upleft)
                ),
                dtype=np.int16,
                count=w * ch,
            )
            out = cur - pred
        else:
            raise ValueError(f"PNG filter type {ft}")
        lines.append(ft)
        lines.extend((out % 256).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG bytes → HxWx3 uint8 array (grayscale replicated to RGB).

    Module-level (picklable) so ``register_codec`` can ship it to
    executors inside the mapInPandas closure. Chunk CRCs are verified —
    a bit-flipped IDAT degrades that row instead of producing silently
    wrong pixels."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while True:
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header past EOF")
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        if pos + length + 4 > len(payload):
            raise ValueError(f"truncated PNG: {ctype!r} data past EOF")
        data = payload[pos : pos + length]
        (crc,) = struct.unpack_from(">I", payload, pos + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += length + 4
        if ctype == b"IHDR":
            # length check BEFORE unpack: a wrong-length IHDR with a
            # valid CRC (unreachable by single-byte-flip fuzzing — a
            # flipped length breaks the CRC first) would otherwise raise
            # struct.error, which is NOT in the kernel's
            # (ValueError, NotImplementedError) degrade set and would
            # fail the whole task instead of the row (review r14)
            if len(data) != 13:
                raise ValueError(
                    f"PNG IHDR length {len(data)} != 13"
                )
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) skipped by construction
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w <= 0 or h <= 0:
        raise ValueError(f"PNG dimensions {w}x{h} not positive")
    if w * h > PNG_MAX_PIXELS:
        # hostile-header guard (found by the fuzz contract: a 2^31-pixel
        # IHDR overflowed the inflate cap's C ssize_t and would otherwise
        # drive a giant allocation) — decode refuses implausible frames
        # loudly instead of attempting them
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the {PNG_MAX_PIXELS}-pixel "
            "decode bound"
        )
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace}: "
            "this pure-stdlib decoder covers 8-bit gray/RGB non-interlaced;"
            " register libpng/PIL through the same seam for the rest"
        )
    ch = 3 if color == 2 else 1
    stride = w * ch
    expected = h * (1 + stride)
    try:
        # cap the inflate at expected+1 bytes: a decompression bomb (a
        # tiny IDAT expanding to gigabytes) must cost one over-read byte
        # and a ValueError, not the whole expansion (fuzz contract)
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(raw) != expected or not d.eof:
        raise ValueError(
            f"PNG raster size {len(raw)}{'+' if not d.eof else ''} != "
            f"{expected}"
        )
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        else:
            # Sub/Average/Paeth have intra-row dependencies: sequential
            # over the (tiny) row. ft validated here so a garbage filter
            # byte is a loud corrupt-stream error, not silent pixels.
            if ft not in (1, 3, 4):
                raise ValueError(f"PNG filter type {ft} in row {y}")
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                cur[i] = (int(line[i]) + pred) % 256
        img[y] = cur.astype(np.uint8)
        prev = cur
    out = img.reshape(h, w, ch)
    if ch == 1:
        out = np.repeat(out, 3, axis=2)
    return out.copy()


def _png_payload(doc_id: int) -> bytes:
    if doc_id % PNG_POISON_MOD == 0:
        return _POISON_GIF
    png = encode_png(_plane_from_hash(image_hash_for_doc(doc_id)))
    if doc_id % PNG_TRUNC_MOD == 0:
        return png[: len(png) // 2]  # valid magic, truncated mid-chunk
    return png


def build_png_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic PNG corpus over documents.doc_id: the certified
    two-level grayscale images as real zlib-compressed PNGs (filter type
    cycling by row), GIF-magic poison every ``PNG_POISON_MOD``-th doc,
    truncated PNG every ``PNG_TRUNC_MOD``-th."""
    return _payload_builder(_png_payload)(
        load_table(spark, sf_dir, "documents")
    )


def q_ns_mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format features through the codec plug seam:
    register the pure-stdlib PNG decoder, then run the identical
    Arrow-batched decode→dims/means/aHash kernel the PPM/BMP query
    certifies — fmt='plugin' marks rows the registry decoded. GIF poison
    exercises the no-codec degrade; truncated PNGs exercise the
    plugin-raised-ValueError degrade (and the CRC/raster guards)."""
    # idempotent dict assignment; the kernel snapshots the registry at
    # plan build time (media_codecs.py contract)
    register_codec(PNG_MAGIC, decode_png)
    return extract_image_features_via(build_png_table(spark, sf_dir))


QUERIES = {"ns_mm_png_features": q_ns_mm_png_features}

# Closed form: identical hash/means arithmetic to the certified
# ns_mm_image_features oracle (the pixel planes ARE the same), with this
# corpus's poison pattern and the 'plugin' fmt label. IMG_POISON_MOD
# deliberately does NOT appear: PNG payloads exist for those docs too.
_PNG_UNDECODABLE = (
    f"(doc_id % {PNG_POISON_MOD} = 0 OR doc_id % {PNG_TRUNC_MOD} = 0)"
)
_PNG_MEAN = f"(200.0 * ({_IMG_K}) + 50.0 * (64 - ({_IMG_K}))) / 64.0"

ORACLES = {
    "ns_mm_png_features": f"""
        WITH {_IMG_HASH_CTE}
        SELECT doc_id,
               CASE WHEN {_PNG_UNDECODABLE} THEN 'undecodable'
                    ELSE 'plugin' END AS fmt,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL ELSE 8 END AS width,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL ELSE 8 END AS height,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL
                    ELSE {_PNG_MEAN} END AS mean_r,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL
                    ELSE {_PNG_MEAN} END AS mean_g,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL
                    ELSE {_PNG_MEAN} END AS mean_b,
               CASE WHEN {_PNG_UNDECODABLE} THEN NULL
                    ELSE {_SIGNED64.format(h='hh')} END AS ahash
        FROM h
    """,
}
