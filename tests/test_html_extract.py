"""HTML block extractor unit tests (north_star block model)."""
from html import unescape

import pytest

from document_extractor_spark.operators.html_extract import (
    StrictParseError,
    classify_blocks,
    extract_html,
    extract_raw,
    norm_ws,
    parse_blocks,
)

CLEAN = """<!DOCTYPE html>
<html><head><title>T | Site</title><style>body{margin:0}</style></head>
<body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/x">About us</a></li></ul></nav>
<main><article>
<h1>Report &amp; Outlook</h1>
<p>Revenue grew twelve percent over the prior year, driven by demand.</p>
<p>Margin expanded as costs stabilized across all regions this year.</p>
<div class="links"><a href="/a">Some related story</a> <a href="/b">Another related story</a></div>
<div>Ad!</div>
</article></main>
<footer><p>Copyright 2026 Example Corp. All rights reserved here.</p></footer>
</body></html>"""

EXPECTED = (
    "Report & Outlook\n"
    "Revenue grew twelve percent over the prior year, driven by demand.\n"
    "Margin expanded as costs stabilized across all regions this year."
)


def test_clean_extraction_strict():
    text, spans = extract_html(CLEAN, strict=True)
    assert text == EXPECTED
    assert len(spans) == 3


def test_span_invariant():
    """norm_ws(unescape(source[start:end])) == block text."""
    text, spans = extract_html(CLEAN, strict=True)
    blocks = text.split("\n")
    for (s, e), block_text in zip(spans, blocks):
        assert norm_ws(unescape(CLEAN[s:e])) == block_text


def test_entities_no_spurious_spaces():
    html = "<html><body><p>AT&amp;T announced twenty new regional plans.</p></body></html>"
    text, _ = extract_html(html)
    assert text == "AT&T announced twenty new regional plans."


def test_boilerplate_dropped():
    blocks = parse_blocks(CLEAN)
    kept = classify_blocks(blocks)
    texts = [b.text for b in kept]
    assert not any("Home" in t for t in texts)  # nav
    assert not any("Copyright" in t for t in texts)  # footer
    assert not any("related story" in t for t in texts)  # link-dense
    assert not any("Ad!" in t for t in texts)  # too short
    assert not any("margin:0" in t for t in texts)  # style
    assert not any("| Site" in t for t in texts)  # title/head


def test_strict_rejects_malformed():
    bad = CLEAN.replace("</article></main>", "</main>")
    with pytest.raises(StrictParseError):
        extract_html(bad, strict=True)
    # lenient recovers the same content
    text, _ = extract_html(bad, strict=False)
    assert text == EXPECTED


def test_strict_requires_root():
    with pytest.raises(StrictParseError):
        extract_html("<p>Just a fragment of text that is long enough here.</p>",
                      strict=True)


def test_raw_strip():
    assert extract_raw("<div>Hello <b>world</b> &amp; you</div>") == "Hello world & you"


def test_heading_kept_regardless_of_length():
    html = "<html><body><main><h1>Tiny</h1><p>%s</p></main></body></html>" % (
        "Real content sentence that is long enough to keep easily.")
    text, _ = extract_html(html)
    assert text.startswith("Tiny\n")
