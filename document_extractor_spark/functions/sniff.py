"""Format dispatch by magic-byte sniff — a pure Column expression.

The reference routes by *file extension* (process_run.py:93-109 with
the allow/deny/noise sets at :35-37). Our input is a binary payload
column, so routing becomes content sniffing (SURVEY.md R1), kept
entirely JVM-side inside whole-stage codegen: the binary prefix is
decoded ISO-8859-1 (lossless byte<->char) and matched with ordinary
string predicates. No Python worker is involved in dispatch, so
Catalyst can push the per-branch filters down to the scan.

Format -> reference route mapping:
  pdf         <- '.pdf'   (%PDF- magic)                -> PDF branch
  html        <- '.txt' + north_star HTML model        -> cascade branch
  txt         <- '.txt'  (decodable text)              -> text branch
  pretext     <- rows with pre-extracted `text` column -> passthrough
  noise       <- '.wav' NOISE_DELETE_EXTS (RIFF/WAVE)  -> silently dropped
  unsupported <- '.xlsx' UNSUPPORTED_EXTS (PK zip) or undecodable
                 -> quarantine
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FMT_PDF = "pdf"
FMT_HTML = "html"
FMT_TXT = "txt"
FMT_DOCX = "docx"
FMT_DOC = "doc"
FMT_GZIP = "gzip"
FMT_PRETEXT = "pretext"
FMT_NOISE = "noise"
FMT_IMG = "img"
FMT_UNSUPPORTED = "unsupported"

ALL_FORMATS = [FMT_PDF, FMT_HTML, FMT_TXT, FMT_DOCX, FMT_DOC, FMT_GZIP,
               FMT_PRETEXT, FMT_NOISE, FMT_IMG, FMT_UNSUPPORTED]

# PNG signature, ISO-8859-1 view (scanned-page payloads -> OCR branch,
# the reference's pass_img.py route)
_PNG_MAGIC_STR = b"\x89PNG\r\n\x1a\n".decode("iso-8859-1")

# OLE2/CFB magic (D0 CF 11 E0 A1 B1 1A E1) as an ISO-8859-1 string —
# the lossless byte<->char decode makes startswith a byte comparison
_CFB_MAGIC_STR = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1".decode("iso-8859-1")

# how many payload bytes the sniffer inspects
_PREFIX_LEN = 512


def sniff_format(html: Column, text: Column) -> Column:
    """Return a `fmt` column from the binary payload + optional text.

    Mirrors the reference's routing table (process_run.py:93-109):
    noise first, then deny-list, then per-format dispatch.
    """
    # lossless byte->char view of the payload prefix
    prefix = F.decode(F.substring(html, 1, _PREFIX_LEN), "ISO-8859-1")
    low = F.lower(prefix)

    is_wav = prefix.startswith("RIFF") & (F.substring(prefix, 9, 4) == "WAVE")
    # real zip signatures only (local header / EOCD / spanned):
    # a text payload that merely starts with "PK" is NOT a zip
    is_zip = (prefix.startswith("PK\x03\x04")
              | prefix.startswith("PK\x05\x06")
              | prefix.startswith("PK\x07\x08"))
    # DOCX = zip whose word/document.xml entry name is visible in the
    # sniffed prefix (first local file header; docx_mini stores it
    # first). Zips that bury it past 512 bytes stay unsupported -
    # mirrored in extract_branches.sniff_bytes (route parity pytest).
    is_docx = (prefix.startswith("PK\x03\x04")
               & prefix.contains("word/document.xml"))
    is_gzip = prefix.startswith("\x1f\x8b")
    # legacy OLE2 container: .doc (also .xls/.ppt — the doc branch
    # quarantines CFB files without a WordDocument stream, mirroring
    # the reference's extension deny-list, process_run.py:35-37)
    is_cfb = prefix.startswith(_CFB_MAGIC_STR)
    is_pdf = prefix.startswith("%PDF-")
    looks_html = (
        low.contains("<!doctype html")
        | low.contains("<html")
        | (low.contains("<head") & low.contains("<body"))
    )
    # printable-text heuristic: no NUL byte in the sniffed prefix
    has_nul = F.instr(prefix, "\x00") > 0

    return (
        F.when(html.isNull() & text.isNotNull(), F.lit(FMT_PRETEXT))
        .when(html.isNull(), F.lit(FMT_UNSUPPORTED))
        .when(is_wav, F.lit(FMT_NOISE))          # noise deleted on sight
        .when(is_gzip, F.lit(FMT_GZIP))          # decompress + re-route
        .when(is_docx, F.lit(FMT_DOCX))          # Office Open XML text
        .when(is_zip, F.lit(FMT_UNSUPPORTED))    # xlsx-style containers
        .when(is_cfb, F.lit(FMT_DOC))            # legacy Word binary
        .when(is_pdf, F.lit(FMT_PDF))
        .when(prefix.startswith(_PNG_MAGIC_STR), F.lit(FMT_IMG))
        .when(looks_html, F.lit(FMT_HTML))
        .when(~has_nul, F.lit(FMT_TXT))
        .otherwise(F.lit(FMT_UNSUPPORTED))
    )
