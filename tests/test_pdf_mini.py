"""Mini PDF parser unit tests (writer<->parser round trip + hostile input)."""
from document_extractor_spark.functions.pdf_mini import parse_pdf, pdf_page_count
from document_extractor_spark.pdf_gen import build_pdf


def test_round_trip_uncompressed():
    doc = parse_pdf(build_pdf([["line one", "line two"], ["page two"]]))
    assert doc.ok and doc.n_pages == 2
    assert doc.page_texts == ["line one\nline two", "page two"]


def test_round_trip_compressed():
    doc = parse_pdf(build_pdf([["alpha"], ["beta", "gamma"]], compress=True))
    assert doc.ok
    assert doc.page_texts == ["alpha", "beta\ngamma"]


def test_string_escapes():
    lines = ["paren (in) text", "back \\ slash", "both (\\) mixed"]
    doc = parse_pdf(build_pdf([lines]))
    assert doc.page_texts[0] == "\n".join(lines)


def test_attachments():
    doc = parse_pdf(build_pdf(
        [["manifest"]],
        attachments=[("a.txt", b"payload-a"), ("b.html", b"<html/>")]))
    assert doc.attachments == [("a.txt", b"payload-a"), ("b.html", b"<html/>")]


def test_empty_pages():
    doc = parse_pdf(build_pdf([[""], [""]]))
    assert doc.ok and doc.n_pages == 2
    assert doc.page_texts == ["", ""]


def test_not_a_pdf():
    assert not parse_pdf(b"hello world").ok
    assert not parse_pdf(None).ok
    assert not parse_pdf(b"").ok


def test_truncated_pdf_never_raises():
    good = build_pdf([["some text content"]])
    for cut in (10, 50, 100, len(good) - 5):
        doc = parse_pdf(good[:cut])  # must not raise (total function)
        assert doc.ok in (True, False)


def test_page_count():
    assert pdf_page_count(build_pdf([["a"], ["b"], ["c"]])) == 3
    assert pdf_page_count(b"junk") == 0


from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=60)


@given(st.lists(st.lists(_line, min_size=1, max_size=4),
                min_size=1, max_size=3),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_round_trip_property(pages, compress):
    """build_pdf -> parse_pdf is the identity on arbitrary unicode
    lines (parens, backslashes, newlines-free by construction)."""
    clean = [[ln.replace("\r", "").replace("\n", "") for ln in pg]
             for pg in pages]
    doc = parse_pdf(build_pdf(clean, compress=compress))
    assert doc.ok and doc.n_pages == len(clean)
    assert doc.page_texts == ["\n".join(pg) for pg in clean]
