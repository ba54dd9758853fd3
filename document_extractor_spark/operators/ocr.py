"""Template-matching OCR over machine-font scan pages (the E3-E7
slot of the reference cascade, re-expressed for a webtext corpus).

Behavioral contracts mirrored from the reference:
- OCR-A strict pass (/root/reference/scripts/pass_pdf_ocr_a.py:117-155):
  one upright decode, FAILS the document on any ambiguity — here,
  any glyph cell that is not an exact font match.
- OCR-B best-of-rotations (/root/reference/scripts/pass_pdf_ocr_b.py:
  128-165): decode every candidate orientation, keep the
  highest-scoring one — here 0/180 degrees, nearest-glyph matching
  within MAX_HAMMING flipped pixels, score = fraction of cells
  within reach (ties prefer upright).
- cascade order A then B with per-document method attribution,
  exactly like the extraction cascade's accept/escalate (R5).

The font (functions/bitfont.py) guarantees >= 5 px between distinct
glyphs and >= 14 px to any 180-rotated glyph, so with MAX_HAMMING=2
the nearest-glyph decode is unambiguous and rotation detection
cannot false-positive. Real-engine OCR (tesseract et al.) remains
out of scope (SURVEY §2.3): what is real here is the full machinery
around it — PNG decode (shared with operators/multimodal), grid
segmentation, exact/nearest classification, rotation scoring, and
the Spark plumbing (one Arrow stage, zero shuffles).
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..functions.bitfont import (
    CELL_H,
    CELL_W,
    GLYPH_H,
    GLYPH_W,
    glyph_rows,
)

MAX_HAMMING = 2

OCR_SCHEMA = ("doc_id long, scan_text string, method string, "
              "status string")


def _font_matrix() -> tuple[np.ndarray, np.ndarray]:
    """(glyphs[n, 35] uint8 ink masks, codes[n]) for 0x20..0x7E."""
    pats, codes = [], []
    for code in range(0x20, 0x7F):
        rows = glyph_rows(chr(code))
        flat = np.zeros(GLYPH_H * GLYPH_W, dtype=np.uint8)
        for r, bits in enumerate(rows):
            for c in range(GLYPH_W):
                if (bits >> (GLYPH_W - 1 - c)) & 1:
                    flat[r * GLYPH_W + c] = 1
        pats.append(flat)
        codes.append(code)
    return np.stack(pats), np.array(codes)


_GLYPHS, _CODES = _font_matrix()
# BLAS form of the Hamming distance: |c xor g| = |c| + |g| - 2 c.g
# for 0/1 vectors; the 35-term dot products are integers <= 35, far
# inside float32's exact-integer range, so the matmul reproduces the
# XOR-sum distances bit-for-bit at ~25x the throughput of the
# (n, 95, 35) byte broadcast.
_GLYPHS_F = _GLYPHS.astype(np.float32)
_GLYPH_POP = _GLYPHS_F.sum(axis=1)


def _cells(page: np.ndarray) -> np.ndarray | None:
    """(nlines*ncols, 35) ink masks on the fixed grid; None if the
    page is not grid-shaped."""
    h, w = page.shape
    if h < 1 or w < 1 or (h - 1) % CELL_H or (w - 1) % CELL_W:
        return None
    nlines, ncols = (h - 1) // CELL_H, (w - 1) // CELL_W
    if nlines == 0 or ncols == 0:
        return np.zeros((0, GLYPH_H * GLYPH_W), dtype=np.uint8)
    ink = (page < 128).astype(np.uint8)
    # strip the leading margin, view as (nlines, CELL_H, ncols,
    # CELL_W), keep each cell's 7x5 glyph interior
    body = ink[1:1 + nlines * CELL_H, 1:1 + ncols * CELL_W]
    grid = body.reshape(nlines, CELL_H, ncols, CELL_W)
    glyph = grid[:, :GLYPH_H, :, :GLYPH_W]
    return (glyph.transpose(0, 2, 1, 3)
            .reshape(nlines * ncols, GLYPH_H * GLYPH_W))


_DECODE_CHUNK = 4096


def _decode_cells(cells: np.ndarray) -> tuple[str, int, int]:
    """(text, n_exact, n_within) nearest-glyph decode of a cell
    batch; cells beyond MAX_HAMMING decode as '?'.

    Chunked: the (chunk, 95, 35) distance tensor is bounded at
    ~13 MB however long the document is — a 1 MB whale page would
    otherwise need ~3 GB in one allocation."""
    if not len(cells):
        return "", 0, 0
    parts, n_exact, n_within = [], 0, 0
    for lo in range(0, len(cells), _DECODE_CHUNK):
        chunk = cells[lo:lo + _DECODE_CHUNK]
        # Hamming distance to every glyph via the exact float32
        # matmul identity (see _GLYPHS_F note)
        cf = chunk.astype(np.float32)
        dists = (cf.sum(axis=1)[:, None] + _GLYPH_POP[None, :]
                 - 2.0 * (cf @ _GLYPHS_F.T)).astype(np.int64)
        best = dists.argmin(axis=1)
        bestd = dists[np.arange(len(chunk)), best]
        chars = np.where(bestd <= MAX_HAMMING, _CODES[best],
                         ord("?")).astype(np.uint32)
        parts.append("".join(map(chr, chars)))
        n_exact += int((bestd == 0).sum())
        n_within += int((bestd <= MAX_HAMMING).sum())
    return "".join(parts), n_exact, n_within


def _join_lines(text: str, ncols: int) -> str:
    """Reassemble the hard-wrapped content: concatenate the fixed-
    width lines and drop the final line's trailing space padding."""
    if ncols == 0:
        return ""
    lines = [text[i:i + ncols] for i in range(0, len(text), ncols)]
    return "".join(lines).rstrip(" ")


def ocr_bitmap_strict(page: np.ndarray,
                      cells: np.ndarray | None = None) -> str | None:
    """OCR-A on a grayscale raster: upright, every cell an exact
    glyph — None on any ambiguity (off-grid page, inexact cell).
    `cells` lets a caller reuse an existing segmentation."""
    if cells is None:
        cells = _cells(page)
    if cells is None:
        return None
    text, n_exact, _ = _decode_cells(cells)
    if n_exact != len(cells):
        return None
    return _join_lines(text, (page.shape[1] - 1) // CELL_W)


def ocr_bitmap_best(
    page: np.ndarray,
    cells: np.ndarray | None = None,
    upright: tuple[str, int, int] | None = None,
) -> tuple[str | None, bool]:
    """OCR-B on a grayscale raster: decode 0/180 degrees, keep the
    orientation with the most cells within MAX_HAMMING (ties prefer
    upright). Returns (text, all_cells_placed); (None, False) for an
    off-grid page. `cells`/`upright` let a caller reuse the
    segmentation and the upright _decode_cells result the cascade
    already computed for the strict pass."""
    if cells is None:
        cells = _cells(page)
    if cells is None:
        return None, False
    ncols = (page.shape[1] - 1) // CELL_W
    candidates = []
    for rot, cs, pre in ((0, cells, upright),
                         (180, _cells(np.rot90(page, 2).copy()), None)):
        txt, _, n_within = pre if pre is not None else _decode_cells(cs)
        score = n_within / len(cs) if len(cs) else 1.0
        candidates.append((score, -rot, txt, n_within, len(cs)))
    score, _negrot, txt, n_within, n = max(candidates)
    return _join_lines(txt, ncols), n_within == n


def ocr_page(payload: bytes | None) -> tuple[str | None, str, str]:
    """(text, method, status) for one scan PNG: OCR-A strict upright
    pass, then OCR-B best-of-rotations. status ERROR when even B
    cannot place every cell. The page is segmented once and the
    upright decode computed once; A and B share both.

    Total over bytes: a color/alpha PNG (3-4 channels, or gray+alpha)
    is not a scan page — it decodes to w*h*channels samples, which is
    reported as ERROR rather than crashing the Arrow kernel on a
    bad reshape."""
    from .multimodal import _png_pixel_values, _png_dims

    if payload is None:
        return None, "none", "ERROR"
    vals = _png_pixel_values(payload)
    if vals is None:
        return None, "none", "ERROR"
    w, h = _png_dims(payload)
    if w is None or h is None or len(vals) != w * h:
        return None, "none", "ERROR"
    page = vals.astype(np.uint8).reshape(h, w)
    cells = _cells(page)
    if cells is None:
        return None, "none", "ERROR"
    decoded = _decode_cells(cells)
    text, n_exact, _ = decoded
    if n_exact == len(cells):
        return (_join_lines(text, (page.shape[1] - 1) // CELL_W),
                "ocr_a", "OK")
    text, placed = ocr_bitmap_best(page, cells=cells, upright=decoded)
    return text, "ocr_b", "OK" if placed else "ERROR"


def ocr_scans_kernel(batches: Iterator[pd.DataFrame],
                     payload_col: str = "scan",
                     id_col: str = "doc_id") -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (id, scan binary) -> OCR_SCHEMA rows."""
    for pdf in batches:
        out = []
        for did, payload in zip(pdf[id_col], pdf[payload_col]):
            text, method, status = ocr_page(
                bytes(payload) if payload is not None else None)
            out.append((did, text, method, status))
        yield pd.DataFrame(
            out, columns=[id_col, "scan_text", "method", "status"])
