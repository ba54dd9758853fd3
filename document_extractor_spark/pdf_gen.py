"""Minimal deterministic PDF *writer* for the synthetic corpus.

Emits valid PDF 1.4 files (page tree, per-page Flate or raw content
streams, BT/Td/Tj text ops, optional portfolio attachments via
/Filespec + /EF embedded-file streams) consumed both by our parser
(functions/pdf_mini.py) and, structurally, by any standard reader.
Used only by the corpus generator and tests — never by the pipeline.
"""
from __future__ import annotations

import zlib


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(lines: list[str]) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append("0 -14 Td")
        ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("utf-8")


def build_pdf(
    pages: list[list[str]],
    compress: bool = False,
    attachments: list[tuple[str, bytes]] | None = None,
) -> bytes:
    """pages: list of pages, each a list of text lines."""
    objs: dict[int, bytes] = {}
    next_num = 3
    # allocate the font number upfront (pages reference it); compact
    # numbering keeps the xref free of padded free-entry lines
    font_num = 3 + 2 * len(pages)
    page_nums: list[int] = []
    for page_lines in pages:
        content_num, page_num = next_num, next_num + 1
        next_num += 2
        raw = _content_stream(page_lines)
        if compress:
            comp = zlib.compress(raw)
            objs[content_num] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp + b"\nendstream"
            )
        else:
            objs[content_num] = (
                b"<< /Length %d >>\nstream\n" % len(raw) + raw + b"\nendstream"
            )
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (content_num, font_num)
        )
        page_nums.append(page_num)

    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_num += 1

    # portfolio attachments (reference analog: PDF portfolios handled
    # by pdfdetach in portfolio_unpack.py:14-23,146-150)
    names_entries: list[bytes] = []
    for name, payload in attachments or []:
        stream_num, spec_num = next_num, next_num + 1
        next_num += 2
        objs[stream_num] = (
            b"<< /Type /EmbeddedFile /Length %d >>\nstream\n" % len(payload)
            + payload + b"\nendstream"
        )
        objs[spec_num] = (
            b"<< /Type /Filespec /F (%s) /EF << /F %d 0 R >> >>"
            % (_esc(name).encode("utf-8"), stream_num)
        )
        names_entries.append(b"(%s) %d 0 R" % (_esc(name).encode(), spec_num))

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    catalog = b"<< /Type /Catalog /Pages 2 0 R"
    if names_entries:
        catalog += (
            b" /Names << /EmbeddedFiles << /Names [%s] >> >>"
            % b" ".join(names_entries)
        )
    catalog += b" >>"
    objs[1] = catalog

    return _assemble(objs)


def build_scanned_pdf(bitmaps) -> bytes:
    """A scanned PDF: every page is ONE grayscale raster (8-bit
    /DeviceGray /FlateDecode Image XObject) drawn by a text-free
    content stream — the page tree a scanner/print-to-PDF emits.
    `bitmaps`: list of 2-D uint8 numpy arrays (255 paper, 0 ink).
    The empty text layer sends the document through the reference's
    scan-only triage into the OCR cascade (pass_pdf.py:112-255)."""
    import zlib as _zlib

    objs: dict[int, bytes] = {}
    next_num = 3
    page_nums: list[int] = []
    for page in bitmaps:
        h, w = page.shape
        img_num, content_num, page_num = next_num, next_num + 1, next_num + 2
        next_num += 3
        raw = _zlib.compress(page.tobytes())
        objs[img_num] = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (w, h, len(raw)) + raw + b"\nendstream"
        )
        draw = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        objs[content_num] = (
            b"<< /Length %d >>\nstream\n" % len(draw) + draw
            + b"\nendstream"
        )
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Contents %d 0 R /Resources << /XObject "
            b"<< /Im0 %d 0 R >> >> >>"
            % (w, h, content_num, img_num)
        )
        page_nums.append(page_num)
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[2] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (kids, len(page_nums)))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    return _assemble(objs)


def _assemble(objs: dict[int, bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(objs)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += (
            b"%010d 00000 n \n" % offsets[num]
            if num in offsets else b"0000000000 65535 f \n"
        )
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (maxnum + 1, xref_pos)
    )
    return bytes(out)
