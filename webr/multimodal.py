"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The actual codecs are NOT in this container, so the decode step is stubbed
two ways (clearly marked): ``decode_stub='fake'`` produces deterministic
metadata derived from the payload bytes (so the Spark-side plumbing —
schema, batch shape, partitioning — is real and testable), and
``decode_stub='raise'`` raises NotImplementedError the way the real
integration point would surface a missing codec. Swapping in PIL/ffmpeg is
confined to ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_META = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), False),
    StructField("sha256", StringType(), False),
    StructField("format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])

# ---------------------------------------------------------------------------
# Real container sniffing — pure-Python header parsing, no codec needed.
# PNG (IHDR), JPEG (segment walk to SOFn), GIF (logical screen descriptor)
# per their public format specs; everything else -> (None, None, None).

_JPEG_SOF = frozenset(
    # SOF0-15 minus DHT(0xC4) / JPG(0xC8) / DAC(0xCC), per ITU T.81
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC))


def sniff_media(b: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real container headers; unknown or
    truncated input -> (None, None, None); a recognized container whose
    dimensions can't be located keeps the format with NULL dims."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" \
            and b[12:16] == b"IHDR":
        return ("png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
                break
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if seglen < 2:
                break
            if marker in _JPEG_SOF and i + 9 <= len(b):
                return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"))
            i += 2 + seglen
        return ("jpeg", None, None)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    return (None, None, None)


def png_bytes(w: int, h: int) -> bytes:
    """Minimal spec-valid PNG prefix (signature + IHDR incl. real CRC);
    33 bytes. Used to synthesize deterministic test/oracle payloads."""
    import zlib
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 0, 0, 0, 0]))
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + len(ihdr).to_bytes(4, "big") + chunk
            + zlib.crc32(chunk).to_bytes(4, "big"))


def jpeg_bytes(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 + EOI; 34 bytes. The APP0 segment forces
    the sniffer's walker to skip a non-SOF segment correctly."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = (bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([1, 0x11, 0]))
    return (b"\xff\xd8"
            + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
            + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"\xff\xd9")


def gif_bytes(w: int, h: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer; 14 bytes."""
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0, 0, 0]) + b"\x3b")

FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def _decode_one(payload: bytes, kind: str, mode: str) -> tuple:
    """THE integration point for real codecs (PIL / librosa / pyav).
    mode='sniff': REAL header parsing (PNG/JPEG/GIF via sniff_media) —
    no codec required; unknown containers get NULL dims, never a raise.
    mode='fake': deterministic pseudo-metadata from the digest bytes.
    mode='raise': behave like the missing-codec production error."""
    if mode == "sniff":
        _fmt, w, h = sniff_media(payload or b"")
        return w, h, (1 if w is not None else None)
    if mode == "raise":
        raise NotImplementedError(
            f"no {kind} codec in this environment; install the codec and "
            f"replace _decode_one")
    digest = hashlib.sha256(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    return width, height, n_frames


def extract_media_meta(media: DataFrame, kind_col: str = "kind",
                       decode_stub: str = "fake") -> DataFrame:
    """media: (media_id string, kind string, payload binary) ->
    MEDIA_META. Arrow-batched; one python pass per batch, no per-row UDF
    round trips. ``format`` is ALWAYS the real sniffed container format
    (header parse needs no codec); width/height/n_frames come from
    ``decode_stub`` ('sniff' = real header dims, 'fake' = digest-derived
    stand-ins, 'raise' = missing-codec error)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf[kind_col], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt = sniff_media(b)[0]
                w, h, nf = _decode_one(b, kind, decode_stub)
                rows.append((mid, kind, len(b),
                             hashlib.sha256(b).hexdigest(), fmt, w, h, nf))
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in MEDIA_META.fields])
    return media.mapInPandas(gen, schema=MEDIA_META)


def sample_frames(media: DataFrame, every_n: int = 8,
                  decode_stub: str = "fake") -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (a UDTF-shaped grouped expansion). The fake decode emits digest-derived
    32-byte pseudo-frames so downstream batch shapes are real."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                _w, _h, nf = _decode_one(b, kind, decode_stub)
                for fno in range(0, nf, every_n):
                    frame = hashlib.sha256(
                        b + fno.to_bytes(4, "big")).digest()
                    out.append((mid, fno, frame))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in FRAME_SCHEMA.fields])
    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


def pages_as_media(pages: DataFrame) -> DataFrame:
    """Adapter: treat page html payloads as media rows (the plumbing demo
    used by tests; real corpora carry actual image/audio bytes)."""
    return pages.select(
        F.col("url").alias("media_id"),
        F.when(F.crc32(F.col("url")) % 3 == 0, "image")
        .when(F.crc32(F.col("url")) % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.col("html").alias("payload"))
