"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (the image/audio libraries
are not in this container — each stub is a deterministic fake behind
an import-try so the Spark-side contract is fully real and tested):
schema, partitioning, Arrow batch shape, and UDF signatures are the
production surface; swapping a real decoder in changes one function
body and nothing else.

Design points for 100 TB:
- media stays an opaque `binary` column; metadata (kind, width,
  height, duration, codec) is a typed struct extracted once and
  stored columnar, so later filters prune on metadata without ever
  touching bytes (column pruning keeps the binary out of the scan).
- decode/feature kernels run in `mapInPandas` with small Arrow
  batches (binary rows are huge); never per-row Python UDFs.
- frame sampling emits one row per sampled frame (explode analog),
  sized by an explicit stride so output row count is predictable.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_META_SCHEMA = (
    "id long, kind string, n_bytes long, width int, height int, "
    "duration_ms int, codec string"
)
FEATURE_SCHEMA = "id long, kind string, feature array<float>"
FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"


def _sniff_media_kind(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[4:8] == b"ftyp":
        return "video/mp4"
    return "binary/unknown"


# ---------------------------------------------------------------------------
# REAL header parsers (stdlib-only): metadata extraction does not need
# image/audio libraries — only pixel/sample DECODE does (still stubbed
# in media_features / frame sampling). A payload whose magic matches
# but whose header is truncated/garbled degrades to None fields.
# ---------------------------------------------------------------------------
def _png_dims(payload: bytes) -> tuple[int | None, int | None]:
    """IHDR is always the first chunk: width/height at bytes 16..24."""
    if len(payload) >= 24 and payload[12:16] == b"IHDR":
        return (int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"))
    return None, None


_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _jpeg_dims(payload: bytes) -> tuple[int | None, int | None]:
    """Walk marker segments to the first SOFn frame header."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None, None
        marker = payload[i + 1]
        if marker in _JPEG_SOF:
            if i + 9 <= n:
                return (int.from_bytes(payload[i + 7:i + 9], "big"),
                        int.from_bytes(payload[i + 5:i + 7], "big"))
            return None, None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length
            continue
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2:
            return None, None
        i += 2 + seg_len
    return None, None


def _wav_meta(payload: bytes) -> tuple[int | None, str | None]:
    """RIFF chunk walk: (duration_ms, 'pcm<bits>@<rate>') from the
    fmt and data chunks."""
    pos, n = 12, len(payload)
    rate = channels = bits = data_size = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate and channels and bits and data_size is not None:
        bytes_per_sec = rate * channels * (bits // 8)
        if bytes_per_sec:
            return (round(1000 * data_size / bytes_per_sec),
                    f"pcm{bits}@{rate}")
    return None, None


def _mp4_duration_ms(payload: bytes) -> int | None:
    """Top-level box walk to moov/mvhd (version 0): duration/timescale."""
    def walk(buf: bytes, want: bytes) -> bytes | None:
        pos = 0
        while pos + 8 <= len(buf):
            size = int.from_bytes(buf[pos:pos + 4], "big")
            btype = buf[pos + 4:pos + 8]
            if size < 8:
                return None
            if btype == want:
                return buf[pos + 8:pos + size]
            pos += size
        return None

    moov = walk(payload, b"moov")
    if moov is None:
        return None
    mvhd = walk(moov, b"mvhd")
    if mvhd is None or len(mvhd) < 20 or mvhd[0] != 0:
        return None
    timescale = int.from_bytes(mvhd[12:16], "big")
    duration = int.from_bytes(mvhd[16:20], "big")
    return round(1000 * duration / timescale) if timescale else None


def extract_media_meta(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (id, media binary) -> typed metadata row.

    Width/height/duration come from REAL header parsing (PNG IHDR,
    JPEG SOFn walk, RIFF fmt/data chunks, MP4 mvhd box) — no external
    library needed for metadata; only content decode stays stubbed."""
    for pdf_batch in batches:
        out = []
        for r in pdf_batch.itertuples(index=False):
            payload = r.media
            kind = _sniff_media_kind(payload)
            w = h = dur = None
            codec = kind.split("/")[-1]
            if kind == "image/png":
                w, h = _png_dims(payload)
            elif kind == "image/jpeg":
                w, h = _jpeg_dims(payload)
            elif kind == "audio/wav":
                dur, fmt = _wav_meta(payload)
                codec = fmt or codec
            elif kind == "video/mp4":
                dur = _mp4_duration_ms(payload)
            out.append({
                "id": r.id, "kind": kind,
                "n_bytes": len(payload) if payload else 0,
                "width": w, "height": h, "duration_ms": dur,
                "codec": codec,
            })
        yield pd.DataFrame(out, columns=[
            "id", "kind", "n_bytes", "width", "height", "duration_ms",
            "codec"])


def media_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Feature-extraction kernel (stub: deterministic 8-dim md5
    projection in place of a real embedding model)."""
    for pdf_batch in batches:
        out = []
        for r in pdf_batch.itertuples(index=False):
            payload = r.media or b""
            digest = hashlib.md5(payload).digest()
            vec = (np.frombuffer(digest[:8], dtype=np.uint8)
                   .astype(np.float32) / 255.0)
            out.append({"id": r.id, "kind": _sniff_media_kind(payload),
                        "feature": vec.tolist()})
        yield pd.DataFrame(out, columns=["id", "kind", "feature"])


def make_frame_sampler(stride: int = 10, max_frames: int = 8):
    """Frame-sampling kernel factory (video -> frame rows). Stub slices
    the payload at deterministic offsets in place of real decode."""
    def sample_frames(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = []
            for r in pdf_batch.itertuples(index=False):
                payload = r.media or b""
                n = min(max_frames, max(0, len(payload) // (stride * 16)))
                for i in range(n):
                    off = i * stride * 16
                    out.append({"id": r.id, "frame_idx": i,
                                "frame_bytes": payload[off:off + 16]})
            yield pd.DataFrame(out, columns=["id", "frame_idx",
                                             "frame_bytes"])

    return sample_frames


def media_meta_table(media: DataFrame) -> DataFrame:
    """(id, media) -> metadata table (the production call shape)."""
    return media.select("id", "media").mapInPandas(
        extract_media_meta, schema=MEDIA_META_SCHEMA)


def media_feature_table(media: DataFrame) -> DataFrame:
    return media.select("id", "media").mapInPandas(
        media_features, schema=FEATURE_SCHEMA)


def sampled_frames_table(media: DataFrame, stride: int = 10,
                         max_frames: int = 8) -> DataFrame:
    return media.select("id", "media").mapInPandas(
        make_frame_sampler(stride, max_frames), schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic media builders (corpus/test fixtures + the driver
# oracle): minimal VALID headers the real parsers above can read.
# ---------------------------------------------------------------------------
def build_png(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def build_wav(seconds: int, rate: int = 8000, channels: int = 1,
              bits: int = 16) -> bytes:
    import struct

    data_size = seconds * rate * channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    # header declares the true data size; the body is truncated (these
    # are metadata fixtures, not playable audio)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_size) + bytes(16))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def build_mp4(duration_s: int, timescale: int = 1000) -> bytes:
    import struct

    mvhd_body = bytes(12) + struct.pack(
        ">II", timescale, duration_s * timescale) + bytes(80)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + bytes(4)
    return ftyp + moov
