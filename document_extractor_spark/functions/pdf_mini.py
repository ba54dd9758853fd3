"""A from-scratch, pure-Python PDF text-layer parser.

pdfminer-style (north_star: "pdfminer-style PDF layout parsing with
reading-order reconstruction"), built because neither PyMuPDF (the
reference's engine, common.py:285-350) nor pdfminer.six exists in this
environment. Pure Python + zlib => executor-safe inside pandas UDFs,
operating on in-memory ``bytes`` (the `html:binary` column) — no temp
files, unlike the reference which round-trips through disk paths.

Supported PDF subset (everything the corpus generator emits, which is
itself a strict subset of PDF 1.4):

- uncompressed or ``/FlateDecode`` content streams,
- page tree: /Catalog -> /Pages -> /Kids (in order) -> /Contents
  (single ref or array of refs),
- text operators in stream order: ``Tj``, ``'``, ``TJ`` (array form);
  line breaks on ``Td``/``TD``/``T*`` after text has been emitted on
  the current line — reading order is stream order, matching the
  reference's ``page.get_text("text")`` contract (common.py:347-348),
- literal strings with ``\\`` escapes and octal escapes,
- portfolio attachments: /Type /Filespec + /EF embedded-file streams
  (the reference shells out to ``pdfdetach``, portfolio_unpack.py:14-23,
  146-150; we read the same structures natively).

Per-page text = lines joined with ``"\\n"``; failures return "" per
page (reference extract_text_layer returns "" on failure,
common.py:349-350).
"""
from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
# literal string or operator tokens inside a content stream
_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"  # (s) Tj / (s) '
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"              # [(a) -120 (b)] TJ
    rb"|(?P<mv>T\*|Td|TD)",
    re.DOTALL,
)
_ARR_STR_RE = re.compile(rb"\((?P<s>(?:\\.|[^\\()])*)\)")
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")


@dataclass
class PdfDoc:
    n_pages: int = 0
    page_texts: list[str] = field(default_factory=list)
    # per-page grayscale raster (np.uint8 HxW) when the page carries a
    # decodable /DeviceGray 8-bit /FlateDecode Image XObject — the
    # "page render" input of the OCR cascade (reference E3,
    # pass_pdf_ocr_a.py:35-115 fitz rasterization); None otherwise
    page_images: list = field(default_factory=list)
    attachments: list[tuple[str, bytes]] = field(default_factory=list)
    ok: bool = False
    error: str = ""


def _unescape_pdf_string(raw: bytes) -> bytes:
    if b"\\" not in raw:  # fast path: nothing to unescape
        return raw
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = raw[i + 1]
        simple = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                  0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        if nxt in simple:
            out.append(simple[nxt])
            i += 2
        elif 0x30 <= nxt <= 0x37:  # octal escape
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
            else:  # pragma: no cover - octal regex always matches here
                i += 2
        elif nxt == 0x0A:  # line continuation
            i += 2
        else:
            out.append(nxt)
            i += 2
    return bytes(out)


_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# capture the optional "gen R" tail explicitly instead of a negative
# lookahead: with (?!\s+\d+\s+R) the \d+ BACKTRACKS on "/Length 10 0 R"
# to match just "1" (lookahead then sees "0 0 R" and passes), silently
# truncating the stream; an indirect length must fall back to the
# endstream delimiter scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")
# the stream keyword must follow the dict close — a bare find(b"stream")
# also matches inside literal strings like /F (stream.txt)
_STREAM_KW_RE = re.compile(rb">>\s*stream")


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number -> (dict/body bytes, decoded stream bytes or None).

    Streams are consumed *positionally* using /Length: compressed bytes
    can legally contain the literals `endobj`/`endstream`, so a pure
    regex-to-delimiter scan would truncate them (and did). A sequential
    cursor skips object headers that fall inside consumed stream data.
    """
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    # every object header precedes the last `endobj`; bounding the
    # search there keeps the digit-dense xref table (20 bytes/entry of
    # pure digits, where \d+\s+\d+ backtracks per position) out of the
    # regex scan entirely
    last_endobj = data.rfind(b"endobj")
    endpos = (last_endobj + len(b"endobj")) if last_endobj != -1 else len(data)
    while True:
        # search from the cursor instead of finditer over the whole
        # payload: stream bodies are never regex-scanned (compressed
        # bytes are digit-dense and made the scan the hot spot)
        m = _OBJ_HEADER_RE.search(data, pos, endpos)
        if m is None:
            break
        num = int(m.group(1))
        skw = _STREAM_KW_RE.search(data, m.end())
        sidx = skw.start() if skw else -1
        eidx = data.find(b"endobj", m.end())
        if sidx != -1 and (eidx == -1 or sidx < eidx):
            head = data[m.end():sidx]
            dstart = skw.end()
            if data[dstart:dstart + 2] == b"\r\n":
                dstart += 2
            elif data[dstart:dstart + 1] == b"\n":
                dstart += 1
            lm = _LENGTH_RE.search(head)
            if lm and not lm.group(2):
                dend = dstart + int(lm.group(1))
            else:  # no/indirect /Length: fall back to delimiter scan
                dend = data.find(b"endstream", dstart)
                if dend == -1:
                    dend = len(data)
            stream: bytes | None = data[dstart:dend]
            if b"/FlateDecode" in head:
                try:
                    stream = zlib.decompress(stream)
                except zlib.error:
                    stream = None
            objects[num] = (head, stream)
            nxt = data.find(b"endobj", dend)
            pos = (nxt + len(b"endobj")) if nxt != -1 else dend
        else:
            if eidx == -1:
                eidx = len(data)
            objects[num] = (data[m.end():eidx], None)
            pos = eidx + len(b"endobj")
    return objects


def _stream_to_lines(stream: bytes) -> list[str]:
    """Decode text operators in stream order into lines."""
    lines: list[str] = []
    current: list[bytes] = []
    emitted_on_line = False

    def flush() -> None:
        nonlocal emitted_on_line
        lines.append(b"".join(current).decode("utf-8", errors="replace"))
        current.clear()
        emitted_on_line = False

    for m in _TEXT_TOKEN_RE.finditer(stream):
        if m.group("op") is not None:
            if m.group("op") == b"'":  # ' implies move-to-next-line first
                if emitted_on_line or current:
                    flush()
            current.append(_unescape_pdf_string(m.group("str")))
            emitted_on_line = True
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                current.append(_unescape_pdf_string(sm.group("s")))
            emitted_on_line = True
        else:  # Td / TD / T* — a line move; break only after emitted text
            if emitted_on_line:
                flush()
    if current or emitted_on_line:
        flush()
    return lines


_XOBJ_REF_RE = re.compile(rb"/XObject\s*<<([^>]*)>>")
_IMG_DIM_RE = re.compile(rb"/(Width|Height)\s+(\d+)")


def _page_image(page_body: bytes,
                objects: dict[int, tuple[bytes, bytes | None]]):
    """First decodable grayscale raster referenced by the page's
    /Resources /XObject dict, as an HxW uint8 array; None when the
    page has no such image (the common text-PDF case — zero cost)."""
    import numpy as _np

    xm = _XOBJ_REF_RE.search(page_body)
    if xm is None:
        return None
    for ref in _REF_RE.findall(xm.group(1)):
        entry = objects.get(int(ref))
        if entry is None:
            continue
        head, stream = entry
        if (b"/Image" not in head or stream is None
                or b"/DeviceGray" not in head
                or b"/BitsPerComponent 8" not in head):
            continue
        dims = {m.group(1): int(m.group(2))
                for m in _IMG_DIM_RE.finditer(head)}
        w, h = dims.get(b"Width"), dims.get(b"Height")
        if not w or not h or len(stream) != w * h:
            continue
        return _np.frombuffer(stream, dtype=_np.uint8).reshape(h, w)
    return None


def _find_refs(body: bytes, key: bytes) -> list[int]:
    """All object refs following /Key (single ref or array)."""
    idx = body.find(key)
    if idx < 0:
        return []
    tail = body[idx + len(key):]
    arr_start = tail.lstrip()[:1]
    if arr_start == b"[":
        close = tail.find(b"]")
        return [int(r) for r in _REF_RE.findall(tail[: close + 1])]
    m = _REF_RE.match(tail.strip())
    return [int(m.group(1))] if m else []


def parse_pdf(data: bytes | None) -> PdfDoc:
    """Parse a PDF payload into page texts + portfolio attachments."""
    doc = PdfDoc()
    if not data or not data.startswith(b"%PDF-"):
        doc.error = "not a pdf"
        return doc
    try:
        objects = _parse_objects(data)
        if not objects:
            doc.error = "no objects"
            return doc

        catalog = None
        for body, _ in objects.values():
            if b"/Type" in body and b"/Catalog" in body:
                catalog = body
                break
        if catalog is None:
            doc.error = "no catalog"
            return doc

        pages_refs = _find_refs(catalog, b"/Pages")
        kid_refs: list[int] = []
        if pages_refs and pages_refs[0] in objects:
            kid_refs = _find_refs(objects[pages_refs[0]][0], b"/Kids")

        for kid in kid_refs:
            if kid not in objects:
                doc.page_texts.append("")
                doc.page_images.append(None)
                continue
            page_body, _ = objects[kid]
            content_refs = _find_refs(page_body, b"/Contents")
            parts: list[str] = []
            for cref in content_refs:
                entry = objects.get(cref)
                if entry and entry[1] is not None:
                    parts.extend(_stream_to_lines(entry[1]))
            doc.page_texts.append("\n".join(parts))
            doc.page_images.append(_page_image(page_body, objects))
        doc.n_pages = len(doc.page_texts)

        # portfolio attachments: /Filespec objects with /EF streams
        # (reference: pdfdetach -list / -saveall, portfolio_unpack.py)
        for body, _ in objects.values():
            if b"/Filespec" not in body:
                continue
            fm = re.search(rb"/F\s*\((?P<n>(?:\\.|[^\\()])*)\)", body)
            name = (
                _unescape_pdf_string(fm.group("n")).decode("utf-8", "replace")
                if fm else "attachment"
            )
            # /EF << /F n 0 R >> — the embedded-file stream ref
            efm = re.search(rb"/EF\s*<<\s*/F\s+(\d+)\s+\d+\s+R", body)
            if efm:
                eobj = objects.get(int(efm.group(1)))
                if eobj and eobj[1] is not None:
                    doc.attachments.append((name, eobj[1]))

        doc.ok = doc.n_pages > 0
        if not doc.ok:
            doc.error = "no pages"
        return doc
    except Exception as exc:  # total: extractor must never throw per-row
        doc.error = f"{type(exc).__name__}: {exc}"
        doc.ok = False
        return doc


def pdf_page_count(data: bytes | None) -> int:
    """Page count (reference common.py:285-303)."""
    return parse_pdf(data).n_pages
