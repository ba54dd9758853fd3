"""Encoding / charset normalization (north_star requirement).

Two decode modes:

- ``decode_reference``: byte-parity with the reference's lossy
  ``open(..., encoding='utf-8', errors='ignore')`` (pass_txt.py:30-31)
  — invalid byte sequences silently dropped. Used on the txt branch
  where the per-url byte-identical invariant is checked.
- ``decode_detect``: the engine's proper decode — BOM sniff
  (UTF-8-sig / UTF-32 / UTF-16 LE+BE), strict UTF-8 attempt, Latin-1 fallback
  (total: never fails), documented as a deliberate divergence
  (SURVEY.md R8). Used on the HTML branch before DOM parsing.
"""
from __future__ import annotations

import pandas as pd



def decode_reference(payload: bytes | None) -> str:
    """Lossy UTF-8 decode, parity with reference pass_txt.py:30-31."""
    if payload is None:
        return ""
    return payload.decode("utf-8", errors="ignore")


def decode_detect(payload: bytes | None) -> tuple[str, str]:
    """Charset-detected decode -> (text, charset_used).

    Deterministic cascade: BOM > strict UTF-8 > Latin-1. Latin-1 is
    total over bytes, so this never raises.
    """
    if payload is None:
        return "", "none"
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace"), "utf-8-sig"
    # UTF-32 BOMs BEFORE UTF-16: ff fe 00 00 begins with the UTF-16-LE
    # BOM, so the shorter prefix must not win
    if payload.startswith(b"\xff\xfe\x00\x00"):
        return payload[4:].decode("utf-32-le", errors="replace"), "utf-32-le"
    if payload.startswith(b"\x00\x00\xfe\xff"):
        return payload[4:].decode("utf-32-be", errors="replace"), "utf-32-be"
    if payload.startswith(b"\xff\xfe"):
        return payload[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return payload[2:].decode("utf-16-be", errors="replace"), "utf-16-be"
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"



def csv_safe_text(text_col):
    """R7 text-cleaning projection (reference common_pdf.sh:37
    ``clean_text``): strip ``\\r``, escape newlines to the two-byte
    literal ``\\n``, double every ``\"`` — the field is then safe to
    embed in a QUOTE_ALL CSV cell. Pure JVM ``replace`` (literal, no
    regex semantics), zero-shuffle projection; under parquet this
    cleaning is unnecessary (binary-safe), it exists for the CSV
    index sink's byte parity with the reference pipeline."""
    from pyspark.sql import functions as F

    c = F.replace(text_col, F.lit("\r"), F.lit(""))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit('"'), F.lit('""'))


def nfc_normalize_col(text_col):
    """Arrow-batched Unicode NFC normalization (C4/CCNet-style text
    canonicalization slot): combining sequences composed so that
    byte-level dedup/fingerprint operators see one canonical form.

    Python's unicodedata and DuckDB's utf8proc agree byte-for-byte on
    NFC (Unicode normalization stability policy; parity pinned in
    tests/test_textnorm.py over the hazard cases: Hangul jamo,
    combining marks, compatibility ligatures left untouched).
    Implemented as a pandas_udf because Spark has no JVM-side NFC
    builtin; one Arrow stage, vectorized str map.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: unicodedata.normalize("NFC", t)
            if isinstance(t, str) else t)

    return _nfc(text_col)
