"""Minimal from-scratch DOCX text extraction (stdlib zipfile + XML).

Behavioral twin of the reference's `_docx_text` (pass_doc.py:51-78),
which uses python-docx: body-level paragraphs first (each paragraph's
run text concatenated; w:tab -> "\\t", w:br / w:cr -> "\\n"), then
every table cell's text (the cell's paragraphs joined with "\\n"),
empty strings skipped, everything joined with "\\n". Note the
reference walks ALL paragraphs before ALL tables — not document
order — and this module reproduces that faithfully.

DOC (legacy CFB/OLE binary Word) is NOT parsed: the reference shells
out to antiword/catdoc (pass_doc.py:85-102), neither of which has a
pure-Python from-scratch equivalent of reasonable size; those
payloads keep routing to quarantine with reason "unsupported".
"""
from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

# the sniffer's cheap containment probe (Column + Python twins) looks
# for this marker inside the first 512 payload bytes, so corpus docx
# files store word/document.xml as the FIRST zip entry; real docx
# files that bury it later still quarantine (documented limitation)
DOCX_MARKER = b"word/document.xml"


def _paragraph_text(p) -> str:
    """python-docx Paragraph.text semantics: concatenated run content
    with tab/break elements mapped to whitespace."""
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == _W + "t":
            parts.append(node.text or "")
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
    return "".join(parts)


def docx_text(payload: bytes) -> str:
    """Extract text from DOCX bytes (reference pass_doc.py:51-78).

    Raises on anything that python-docx would fail to open (bad zip,
    missing word/document.xml, malformed XML) — the caller records
    method 'doc_extract_error' exactly like the reference
    (pass_doc.py:216-230).
    """
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        with zf.open("word/document.xml") as f:
            root = ET.parse(f).getroot()
    body = root.find(_W + "body")
    if body is None:
        raise ValueError("docx: no w:body element")
    parts: list[str] = []
    # 1) body-level paragraphs (tables excluded), reference order
    for p in body.findall(_W + "p"):
        t = _paragraph_text(p)
        if t:
            parts.append(t)
    # 2) table cell text: cell paragraphs joined with "\n"
    for tbl in body.findall(_W + "tbl"):
        for tr in tbl.findall(_W + "tr"):
            for tc in tr.findall(_W + "tc"):
                cell = "\n".join(
                    _paragraph_text(p) for p in tc.findall(_W + "p"))
                if cell:
                    parts.append(cell)
    return "\n".join(parts)


_WT_RE = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.DOTALL)
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&"))  # &amp; LAST


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def docx_text_lenient(payload: bytes) -> str:
    """Salvage-mode DOCX text: every ``<w:t>`` run in every ``word/``
    part, document order, joined with newlines — no XML tree, no
    zip-integrity requirement.

    This is the engine's analog of the reference's DOC->PDF second
    chance (pass_doc.py:105-186): when the strict parse scores below
    cutoff, the reference re-extracts via an office->PDF conversion
    and accepts ANY non-blank text (cutoff=0.0).  With no office
    converter in a Spark executor, the lenient re-extract serves the
    same role: it recovers run text the strict body walk misses
    (headers, textboxes) and tolerates malformed XML.  Falls back to
    a raw-bytes regex scan when the zip directory is unreadable
    (fixture docx parts are STORED, so the XML is scannable in
    place); returns "" when nothing is recoverable — never raises.
    """
    chunks: list[bytes] = []
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for name in zf.namelist():
                if name.startswith("word/") and name.endswith(".xml"):
                    chunks.append(zf.read(name))
    except Exception:
        chunks = [payload]
    parts: list[str] = []
    for chunk in chunks:
        for m in _WT_RE.finditer(chunk):
            t = _unescape(m.group(1).decode("utf-8", errors="replace"))
            if t:
                parts.append(t)
    return "\n".join(parts)


def build_docx(paragraphs: list[str],
               table_rows: list[list[str]] | None = None) -> bytes:
    """Deterministic minimal DOCX builder (test fixtures / corpus).

    word/document.xml is stored FIRST (see DOCX_MARKER) with a fixed
    zip timestamp so the same inputs produce identical bytes.
    """
    esc = (lambda s: s.replace("&", "&amp;").replace("<", "&lt;")
           .replace(">", "&gt;"))
    body_parts = [
        f"<w:p><w:r><w:t xml:space=\"preserve\">{esc(t)}</w:t></w:r></w:p>"
        for t in paragraphs
    ]
    if table_rows:
        rows_xml = "".join(
            "<w:tr>" + "".join(
                f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{esc(c)}"
                f"</w:t></w:r></w:p></w:tc>" for c in row)
            + "</w:tr>" for row in table_rows)
        body_parts.append(f"<w:tbl>{rows_xml}</w:tbl>")
    doc_xml = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
        "wordprocessingml/2006/main\"><w:body>"
        + "".join(body_parts) + "</w:body></w:document>")
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/"
        "content-types\">"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/word/document.xml\" ContentType=\""
        "application/vnd.openxmlformats-officedocument.wordprocessingml."
        "document.main+xml\"/></Types>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in (("word/document.xml", doc_xml),
                           ("[Content_Types].xml", content_types)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return buf.getvalue()
