"""Scanned-PDF OCR cascade: raster extraction (E3), A/B passes with
median gating, per-page forcing, and failure routing."""
from __future__ import annotations

import numpy as np

from document_extractor_spark.config import PipelineConfig
from document_extractor_spark.functions.bitfont import (
    normalize_content,
    render_page_bitmap,
)
from document_extractor_spark.functions.pdf_mini import parse_pdf
from document_extractor_spark.operators.extract_branches import _pdf_core
from document_extractor_spark.pdf_gen import build_pdf, build_scanned_pdf

TEXTS = ["First scanned page content here.",
         "Second page, also scanned text."]


def _scan_pdf(rotate=False, noise=False):
    return build_scanned_pdf([
        render_page_bitmap(t, rotate=rotate,
                           noise_seed=f"s{k}" if noise else None,
                           noise_px=2 if noise else 0)
        for k, t in enumerate(TEXTS)])


def test_page_images_extracted():
    doc = parse_pdf(_scan_pdf())
    assert doc.ok and doc.n_pages == 2
    assert all(isinstance(i, np.ndarray) for i in doc.page_images)
    assert doc.page_texts == ["", ""]  # no text layer -> triage


def test_text_pdf_has_no_images():
    doc = parse_pdf(build_pdf([["hello there my good friend today"]]))
    assert doc.page_images == [None]


def test_cascade_ocr_a_accept():
    r = _pdf_core("u", None, "en", _scan_pdf(), PipelineConfig())
    assert (r["method"], r["status"], r["used_fallback"],
            r["per_page"]) == ("ocr_a", "OK", False, True)
    assert [p[1] for p in r["pages"]] == \
        [normalize_content(t) for t in TEXTS]


def test_cascade_ocr_b_rotated_and_noisy():
    for kw in ({"rotate": True}, {"noise": True}):
        r = _pdf_core("u", None, "en", _scan_pdf(**kw), PipelineConfig())
        assert (r["method"], r["status"], r["used_fallback"]) == \
            ("ocr_b", "OK", True)
        assert [p[1] for p in r["pages"]] == \
            [normalize_content(t) for t in TEXTS]


def test_cascade_unreadable_fails_below_cutoff():
    mush = build_scanned_pdf([np.zeros((17, 31), dtype=np.uint8)] * 2)
    r = _pdf_core("u", None, "en", mush, PipelineConfig())
    assert (r["method"], r["status"]) == ("ocr_b", "ERROR")
    assert r["error"].startswith("pdf_below_cutoff")


def test_scanonly_without_images_unchanged():
    # legacy pdf_scanonly fixtures (empty text layer, no rasters)
    # keep their pre-r5 ERROR row exactly
    pdf = build_pdf([[""], [""]])
    r = _pdf_core("u", None, "en", pdf, PipelineConfig())
    assert (r["method"], r["status"]) == ("pdf_text", "ERROR")
    assert "scan-only" in r["error"]


def test_mixed_raster_and_rasterless_pages():
    # one page has no raster: contributes empty text (rel 0) to the
    # median, like a failed tesseract page — 2-of-3 good pages still
    # clear the A cutoff
    bitmaps = [render_page_bitmap(t) for t in TEXTS]
    pdf = build_scanned_pdf(bitmaps)
    # splice a rasterless page in by rebuilding: easier — 3 pages,
    # middle one an off-grid (non-decodable) raster
    pdf = build_scanned_pdf(
        [bitmaps[0], np.full((10, 10), 255, dtype=np.uint8), bitmaps[1]])
    r = _pdf_core("u", None, "en", pdf, PipelineConfig())
    assert (r["method"], r["status"]) == ("ocr_a", "OK")
    texts = [p[1] for p in r["pages"]]
    assert texts[0] == normalize_content(TEXTS[0]) and texts[1] == ""
