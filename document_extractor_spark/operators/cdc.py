"""Content-defined chunking (CDC) — gear-hash boundaries that
survive edits.

The byte-offset chunkers in operators/chunker.py cut at size
boundaries: insert one character early in a document and EVERY
downstream chunk shifts, so chunk-level dedup between two crawl
snapshots of the same page finds nothing. CDC (the gear/FastCDC
family used by storage dedup and by chunk-level corpus dedup) cuts
where a rolling hash of the local content hits a mask, so boundaries
re-synchronize right after an edit and identical content yields
identical chunks regardless of position.

Hash: "windowed gear" over codepoints — for position t,

    h_t = sum_{k=0..63} gear[cp_{t-k} % 256] << k   (mod 2^64)

This is exactly the classic gear recurrence ``h = (h<<1) + gear[b]``
run from the distant past (bytes older than 64 positions have
shifted out), written as a window so it is POSITION-INDEPENDENT
(the resync property needs no chunk-start state) and vectorizes:
64 shifted adds over a numpy uint64 array, O(64·n) with no Python
per-byte loop. Boundary where ``h & mask == 0`` (mask =
avg_size-1, avg_size a power of two), subject to min_size /
max_size enforcement (greedy from the previous cut, forced cut at
max_size — the FastCDC normalization).

Spark surface: an Arrow-batched ``mapInPandas`` kernel emitting one
row per chunk `(key, chunk_idx, start, length, chunk_hash)` with
CHARACTER offsets (never mid-codepoint splits). Embarrassingly
parallel per document, zero shuffles.

No SQL oracle: a 64-term rolling hash with greedy boundary
enforcement is not reasonably SQL-expressible; the driver registers
this rows-only (like the HLL sketch internals) and correctness is
pinned by an independent pure-Python reference plus the resync /
reconstruction / bounds property tests in tests/test_cdc.py.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_WINDOW = 64

CDC_SCHEMA = ("key long, chunk_idx int, start long, length long, "
              "chunk_hash string")


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry uint64 gear table (md5-derived)."""
    vals = [
        int.from_bytes(hashlib.md5(f"gear:{b}".encode()).digest()[:8],
                       "big")
        for b in range(256)
    ]
    return np.array(vals, dtype=np.uint64)


_GEAR = _gear_table()


def gear_hashes(codepoints: np.ndarray) -> np.ndarray:
    """Vectorized windowed gear hash per position (uint64)."""
    g = _GEAR[codepoints & 0xFF]
    h = np.zeros(len(g), dtype=np.uint64)
    for k in range(min(_WINDOW, len(g))):
        h[k:] += g[: len(g) - k] << np.uint64(k)
    return h


def _select_boundaries(candidates, n: int, min_size: int,
                       max_size: int) -> list[int]:
    """Greedy min/max enforcement over sorted candidate cut points."""
    out: list[int] = []
    start = 0
    ci = 0
    m = len(candidates)
    while start < n:
        cut = min(start + max_size, n)
        while ci < m and candidates[ci] + 1 < start + min_size:
            ci += 1
        if ci < m and candidates[ci] + 1 <= cut:
            cut = int(candidates[ci]) + 1
            ci += 1
        out.append(cut)
        start = cut
    return out


def cdc_boundaries(text: str, min_size: int = 64, avg_size: int = 256,
                   max_size: int = 1024) -> list[int]:
    """Chunk end positions (exclusive, char offsets) for `text`.

    avg_size must be a power of two (mask = avg_size - 1). The final
    position is always a boundary.
    """
    n = len(text)
    if n == 0:
        return []
    mask = np.uint64(avg_size - 1)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    h = gear_hashes(cps)
    candidates = np.nonzero((h & mask) == 0)[0]
    return _select_boundaries(candidates, n, min_size, max_size)


_MAX_BATCH_CHARS = 8 * 1024 * 1024  # ~0.5 GB transient numpy peak


def batch_cdc_boundaries(texts: list[str], min_size: int = 64,
                         avg_size: int = 256,
                         max_size: int = 1024) -> list[list[int]]:
    """cdc_boundaries for many texts in few vectorized hash passes.

    Per-doc numpy calls dominate the naive kernel (64 tiny shifted
    adds per document); instead the docs are concatenated with
    64-codepoint gaps and hashed together. The window never reaches
    a previous doc for positions >= 64, and positions < 64 (whose
    window would cross the gap) are overwritten with the standalone
    prefix hash — `gear_hashes(cps[:64])` is exact there because a
    position-t window only looks back at 0..t. Identical output to
    per-doc `cdc_boundaries` (pinned in tests).

    Peak memory is BOUNDED: texts are processed in greedy sub-groups
    of at most ``_MAX_BATCH_CHARS`` total codepoints (an Arrow batch
    of large documents would otherwise materialize ~30 bytes of
    transient numpy arrays per char of the WHOLE batch at once).
    """
    out_all: list[list[int]] = []
    group: list[str] = []
    group_chars = 0
    for t in texts:
        if group and group_chars + len(t) > _MAX_BATCH_CHARS:
            out_all.extend(_batch_group(group, min_size, avg_size,
                                        max_size))
            group, group_chars = [], 0
        group.append(t)
        group_chars += len(t)
    if group:
        out_all.extend(_batch_group(group, min_size, avg_size,
                                    max_size))
    return out_all


def _batch_group(texts: list[str], min_size: int, avg_size: int,
                 max_size: int) -> list[list[int]]:
    arrays = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
              for t in texts]
    if not arrays:
        return []
    gap = np.zeros(_WINDOW, dtype=np.uint32)
    parts: list[np.ndarray] = []
    for a in arrays:
        parts.append(a)
        parts.append(gap)
    big = np.concatenate(parts)
    h_all = gear_hashes(big)
    mask = np.uint64(avg_size - 1)
    out: list[list[int]] = []
    offset = 0
    for a in arrays:
        n = len(a)
        if n == 0:
            out.append([])
            offset += _WINDOW
            continue
        h = h_all[offset:offset + n].copy()
        head = min(n, _WINDOW)
        h[:head] = gear_hashes(a[:head])
        candidates = np.nonzero((h & mask) == 0)[0]
        out.append(_select_boundaries(candidates, n, min_size, max_size))
        offset += n + _WINDOW
    return out


def _cdc_kernel(key_col: str, text_col: str, min_size: int,
                avg_size: int, max_size: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["key", "chunk_idx", "start", "length", "chunk_hash"]
        for b in batches:
            rows = []
            present = [(int(getattr(r, key_col)), getattr(r, text_col))
                       for r in b.itertuples(index=False)
                       if getattr(r, text_col) is not None]
            all_bounds = batch_cdc_boundaries(
                [t for _, t in present], min_size, avg_size, max_size)
            for (key, text), bounds in zip(present, all_bounds):
                start = 0
                for i, end in enumerate(bounds):
                    chunk = text[start:end]
                    rows.append({
                        "key": key, "chunk_idx": i, "start": start,
                        "length": end - start,
                        "chunk_hash": hashlib.md5(
                            chunk.encode("utf-8")).hexdigest(),
                    })
                    start = end
            yield pd.DataFrame(rows, columns=cols)
    return kernel


def cdc_chunks(docs: DataFrame, key_col: str = "doc_id",
               text_col: str = "text", min_size: int = 64,
               avg_size: int = 256, max_size: int = 1024) -> DataFrame:
    """One row per content-defined chunk; see module doc."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    return docs.select(key_col, text_col).mapInPandas(
        _cdc_kernel(key_col, text_col, min_size, avg_size, max_size),
        CDC_SCHEMA)
