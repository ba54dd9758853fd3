"""Machine-readable 5x7 bitmap font + deterministic scan-page
renderer (the synthetic-scan half of the OCR slot, operators/ocr.py).

The reference's OCR passes rasterize pages and run tesseract
(/root/reference/scripts/pass_pdf_ocr_a.py:117-155,
pass_pdf_ocr_b.py:128-165). External OCR engines are unavailable
here, so the corpus carries scans in a *machine-optimized* font — the
same idea as the OCR-A typeface, taken to its limit: each printable
ASCII glyph encodes its 7-bit codepoint, one bit per pixel row,

    row_i = 0b11010 if bit_i of the code is set else 0b00101

which makes the font, by construction:
- **injective**: distinct codes -> distinct glyphs;
- **5 px minimum pairwise Hamming distance** (the two row patterns
  differ in all 5 columns), so nearest-glyph decoding under <= 2
  flipped pixels is unambiguous;
- **rotation-detecting**: both patterns are asymmetric and neither
  180-degree reversal (0b01011 / 0b10100) is a valid row, so an
  upside-down page matches NO glyph exactly and sits >= 14 px from
  every glyph — the best-of-rotations pass cannot false-positive.

Space (0x20) renders as the blank cell (>= 14 px from every glyph).

Page geometry: glyph cells are 6x8 (5x7 ink + 1 px spacing), with a
1 px margin all round — width 6*ncols+1, height 8*nlines+1. That
layout is 180-degree self-aligned: rotating the page maps cell (l, g)
onto cell (nlines-1-l, ncols-1-g) on the SAME grid, so the OCR reads
both orientations with one grid walk.

Content normalization (pinned, mirrored by the DuckDB oracles):
collapse the pinned whitespace class, strip, then map every char
outside printable ASCII [ -~] to '?'; hard-wrap every `width` chars
(so re-joining segments with '' reconstructs the exact string).
"""
from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 8
_ROW_SET, _ROW_UNSET = 0b11010, 0b00101

# pinned whitespace class (CLAUDE.md): Java and RE2 agree on it
_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")
_NONPRINT_RE = re.compile(r"[^ -~]")


def glyph_rows(ch: str) -> list[int]:
    """7 row bitmasks (5 bits each) for a printable ASCII char;
    space is all-blank."""
    code = ord(ch)
    if not 0x20 <= code <= 0x7E:
        raise ValueError(f"unrenderable codepoint {code:#x}")
    if code == 0x20:
        return [0] * GLYPH_H
    return [
        _ROW_SET if (code >> i) & 1 else _ROW_UNSET
        for i in range(GLYPH_H)
    ]


def normalize_content(text: str | None) -> str:
    """The renderable form of a document's text (see module doc)."""
    # strip(" ") not strip(): after the pinned-class collapse the only
    # strippable char is ' ' — bare strip() would also eat edge chars
    # like \xa0 that the pinned class (and DuckDB trim) leave alone
    collapsed = _WS_RE.sub(" ", text or "").strip(" ")
    return _NONPRINT_RE.sub("?", collapsed)


def wrap_content(content: str, width: int = 80) -> list[str]:
    """Hard-wrap every `width` chars — reversible by ''.join."""
    if not content:
        return [""]
    return [content[i:i + width] for i in range(0, len(content), width)]


_SPRITES: np.ndarray | None = None


def _sprites() -> np.ndarray:
    """(95, CELL_H, CELL_W) uint8 paper/ink cells for 0x20..0x7E —
    the per-pixel glyph_rows loop run ONCE at first use; rendering
    then just gathers whole cells (same bytes, ~30x fewer Python
    ops per character)."""
    global _SPRITES
    if _SPRITES is None:
        arr = np.full((95, CELL_H, CELL_W), 255, dtype=np.uint8)
        for i, code in enumerate(range(0x20, 0x7F)):
            for r, bits in enumerate(glyph_rows(chr(code))):
                for c in range(GLYPH_W):
                    if (bits >> (GLYPH_W - 1 - c)) & 1:
                        arr[i, r, c] = 0
        _SPRITES = arr
    return _SPRITES


def render_bitmap(lines: list[str]) -> np.ndarray:
    """uint8 page bitmap (255 = paper, 0 = ink)."""
    ncols = max((len(ln) for ln in lines), default=0)
    w, h = CELL_W * ncols + 1, CELL_H * len(lines) + 1
    page = np.full((h, w), 255, dtype=np.uint8)
    sprites = _sprites()
    for li, ln in enumerate(lines):
        if not ln:
            continue
        codes = np.array([ord(ch) for ch in ln], dtype=np.int64)
        bad = (codes < 0x20) | (codes > 0x7E)
        if bad.any():
            code = int(codes[bad][0])
            raise ValueError(f"unrenderable codepoint {code:#x}")
        strip = (sprites[codes - 0x20]
                 .transpose(1, 0, 2)
                 .reshape(CELL_H, len(ln) * CELL_W))
        y0 = 1 + CELL_H * li
        page[y0:y0 + CELL_H, 1:1 + len(ln) * CELL_W] = strip
    return page


def encode_png_gray(page: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG (filter 0 rows) — readable by
    operators/multimodal._png_pixel_values."""
    h, w = page.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + page[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def render_scan(text: str | None, width: int = 80, rotate: bool = False,
                noise_seed: str | None = None,
                noise_px: int = 0) -> bytes:
    """Text -> scan-page PNG (render_page_bitmap + PNG encode)."""
    return encode_png_gray(render_page_bitmap(
        text, width, rotate, noise_seed, noise_px))


def render_page_bitmap(text: str | None, width: int = 80,
                       rotate: bool = False,
                       noise_seed: str | None = None,
                       noise_px: int = 0) -> np.ndarray:
    """Text -> scan-page uint8 bitmap. `rotate` turns the page 180
    degrees; `noise_px` flips that many ink-cell pixels at
    md5(noise_seed)-derived positions (deterministic scanner dirt —
    <= 2 px stays below the OCR-B rejection threshold by the font's
    5 px minimum glyph distance)."""
    if noise_px > 7:
        # one md5 digest yields byte pairs for at most 7 flips (bytes
        # 2..15); more would index past it — and >2 flips already
        # exceeds every OCR threshold this fixture knob exists for
        raise ValueError("noise_px must be <= 7")
    lines = wrap_content(normalize_content(text), width)
    page = render_bitmap(lines)
    ncols = max((len(ln) for ln in lines), default=0)
    if noise_px and noise_seed is not None and ncols:
        digest = hashlib.md5(noise_seed.encode()).digest()
        # all flips land in ONE glyph's 5x7 interior (never the
        # spacing pixels an exact-pass grid walk ignores), so the
        # affected cell is guaranteed inexact for OCR-A while staying
        # within nearest-glyph reach for OCR-B
        li = digest[0] % len(lines)
        gi = digest[1] % ncols
        seen: set[tuple[int, int]] = set()
        for i in range(noise_px):
            r = digest[2 + 2 * i] % GLYPH_H
            c = digest[3 + 2 * i] % GLYPH_W
            while (r, c) in seen:  # distinct px so flips never cancel
                c = (c + 1) % GLYPH_W
                r = (r + (c == 0)) % GLYPH_H
            seen.add((r, c))
            page[1 + CELL_H * li + r, 1 + CELL_W * gi + c] ^= 0xFF
    if rotate:
        page = np.rot90(page, 2).copy()
    return page
