"""Scan render + template OCR: font invariants, byte-exact
roundtrips, rotation and noise recovery, malformed payloads."""
from __future__ import annotations

import numpy as np
import pytest

from document_extractor_spark.functions.bitfont import (
    GLYPH_H,
    GLYPH_W,
    glyph_rows,
    normalize_content,
    render_scan,
    wrap_content,
)
from document_extractor_spark.operators.ocr import (
    MAX_HAMMING,
    _GLYPHS,
    ocr_page,
)


def test_font_injective_and_min_distance():
    n = len(_GLYPHS)
    assert n == 95
    d = (_GLYPHS[:, None, :] ^ _GLYPHS[None, :, :]).sum(axis=2)
    off = d[~np.eye(n, dtype=bool)]
    assert off.min() >= 5 > 2 * MAX_HAMMING


def test_font_rotation_distance():
    # every 180-rotated glyph sits far from every upright glyph
    rot = _GLYPHS.reshape(-1, GLYPH_H, GLYPH_W)[:, ::-1, ::-1] \
        .reshape(-1, GLYPH_H * GLYPH_W)
    nonblank = _GLYPHS.sum(axis=1) > 0
    d = (rot[nonblank][:, None, :] ^ _GLYPHS[None, :, :]).sum(axis=2)
    assert d.min() > MAX_HAMMING


def test_glyph_rows_rejects_nonascii():
    with pytest.raises(ValueError):
        glyph_rows("é")


def test_normalize_content_pinned_class():
    assert normalize_content("a\t\nb\x0b  c") == "a b c"
    assert normalize_content("  x  ") == "x"
    assert normalize_content("\xa0x\xa0") == "?x?"  # NOT stripped
    assert normalize_content("héllo…") == "h?llo?"
    assert normalize_content(None) == ""


def test_wrap_reversible():
    s = "x" * 203
    assert "".join(wrap_content(s, 80)) == s
    assert wrap_content("", 80) == [""]


@pytest.mark.parametrize("text", [
    "Hello, World! 123",
    "a" * 205,                       # multi-line wrap
    "punct ~!@#$%^&*()_+`-=[]{}|;':\",./<>?",
    "",
    "tabs\tand\nnewlines collapse",
])
def test_roundtrip_clean(text):
    want = normalize_content(text)
    got, method, status = ocr_page(render_scan(text))
    assert (got, method, status) == (want, "ocr_a", "OK")


def test_roundtrip_rotated():
    text = "Rotated page recovery 42"
    got, method, status = ocr_page(render_scan(text, rotate=True))
    assert (got, method, status) == (normalize_content(text),
                                     "ocr_b", "OK")


def test_roundtrip_noise():
    for seed in ("s1", "s2", "s3", "s4"):
        text = f"Noisy scan {seed} lorem ipsum dolor"
        got, method, status = ocr_page(
            render_scan(text, noise_seed=seed, noise_px=2))
        assert (got, method, status) == (normalize_content(text),
                                         "ocr_b", "OK")


def test_noise_beyond_threshold_errors():
    text = "beyond threshold"
    got, method, status = ocr_page(
        render_scan(text, noise_seed="s", noise_px=3))
    assert method == "ocr_b" and status == "ERROR"
    # the damaged cell reads '?', everything else survives
    want = normalize_content(text)
    assert len(got) == len(want)
    assert sum(a != b for a, b in zip(got, want)) == 1


def test_malformed_payloads():
    assert ocr_page(None) == (None, "none", "ERROR")
    assert ocr_page(b"not a png") == (None, "none", "ERROR")
    # valid PNG but off-grid dimensions
    from document_extractor_spark.functions.bitfont import \
        encode_png_gray
    bad = encode_png_gray(np.full((10, 10), 255, dtype=np.uint8))
    assert ocr_page(bad) == (None, "none", "ERROR")


def test_ocr_kernel_batch(spark):
    import pandas as pd
    from document_extractor_spark.operators.ocr import (
        OCR_SCHEMA, ocr_scans_kernel)

    rows = [(1, render_scan("one")), (2, render_scan("two", rotate=True)),
            (3, None)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "scan"])
    [out] = list(ocr_scans_kernel(iter([pdf])))
    got = {r.doc_id: (r.scan_text, r.method, r.status)
           for r in out.itertuples()}
    assert got[1] == ("one", "ocr_a", "OK")
    assert got[2] == ("two", "ocr_b", "OK")
    assert got[3] == (None, "none", "ERROR")


def test_color_png_is_error_not_crash():
    # sniff routes ANY png to the img branch; a multi-channel (RGB)
    # payload decodes to w*h*3 samples — must report ERROR, never
    # die on the (h, w) reshape inside the Arrow kernel
    from document_extractor_spark.operators.multimodal import (
        build_png_full)

    assert ocr_page(build_png_full(6, 8)) == (None, "none", "ERROR")


def test_noise_px_bound():
    from document_extractor_spark.functions.bitfont import (
        render_page_bitmap)

    with pytest.raises(ValueError):
        render_page_bitmap("x", noise_seed="s", noise_px=8)
    # 7 is the last digest-addressable flip count
    render_page_bitmap("x", noise_seed="s", noise_px=7)


def test_cell_reuse_equivalence():
    # ocr_page's shared segmentation/upright-decode must match the
    # standalone strict/best passes on every cascade outcome
    from document_extractor_spark.functions.bitfont import (
        render_page_bitmap)
    from document_extractor_spark.operators.ocr import (
        ocr_bitmap_best, ocr_bitmap_strict)

    for kw in ({}, {"rotate": True},
               {"noise_seed": "s", "noise_px": 2},
               {"noise_seed": "s", "noise_px": 3}):
        page = render_page_bitmap("reuse equivalence text", **kw)
        strict = ocr_bitmap_strict(page)
        best = ocr_bitmap_best(page)
        from document_extractor_spark.functions.bitfont import (
            encode_png_gray)
        text, method, status = ocr_page(encode_png_gray(page))
        if strict is not None:
            assert (text, method, status) == (strict, "ocr_a", "OK")
        else:
            assert method == "ocr_b"
            assert text == best[0]
            assert status == ("OK" if best[1] else "ERROR")
