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


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real header parse."""
    h = hashlib.md5(payload[:64]).digest()
    return 16 * (1 + h[0] % 64), 16 * (1 + h[1] % 64)


def extract_media_meta(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (id, media binary) -> typed metadata row."""
    for pdf_batch in batches:
        out = []
        for r in pdf_batch.itertuples(index=False):
            payload = r.media
            kind = _sniff_media_kind(payload)
            w = h = dur = None
            if kind.startswith("image/"):
                if _HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode path: PIL present but kernel stubbed")
                w, h = _fake_dims(payload)
            elif kind.startswith(("audio/", "video/")):
                dur = 1000 * (1 + payload[12] % 60) if len(payload) > 12 else 0
            out.append({
                "id": r.id, "kind": kind,
                "n_bytes": len(payload) if payload else 0,
                "width": w, "height": h, "duration_ms": dur,
                "codec": kind.split("/")[-1],
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
