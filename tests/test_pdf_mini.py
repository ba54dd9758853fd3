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


def test_indirect_length_falls_back_to_delimiter_scan():
    """'/Length 10 0 R' must NOT be read as a direct length of 1 (the
    old negative-lookahead regex backtracked into exactly that); the
    endstream delimiter scan recovers the full stream."""
    import zlib

    from document_extractor_spark.functions.pdf_mini import _parse_objects

    body = zlib.compress(b"BT (hello world from an indirect stream) Tj ET")
    data = (
        b"1 0 obj << /Length 10 0 R /Filter /FlateDecode >> stream\n"
        + body + b"\nendstream endobj\n"
        b"10 0 obj " + str(len(body)).encode() + b" endobj\n")
    objs = _parse_objects(data)
    assert objs[1][1] is not None  # decompressed, not truncated to 1 byte
    assert b"hello world" in objs[1][1]


def test_stream_keyword_inside_literal_string_not_a_stream():
    """'(stream.txt)' inside a Filespec body must not make the object a
    stream (the old bare find(b'stream') swallowed every later object)."""
    from document_extractor_spark.functions.pdf_mini import _parse_objects

    data = (
        b"7 0 obj << /Type /Filespec /F (stream.txt) /EF << /F 8 0 R >> >>"
        b" endobj\n"
        b"8 0 obj << /Length 5 >> stream\nhello\nendstream endobj\n")
    objs = _parse_objects(data)
    assert objs[7][1] is None          # not a stream object
    assert b"stream.txt" in objs[7][0]
    assert objs[8][1] == b"hello"      # the real stream still parses
