"""Charset decode tests: reference lossy parity + detected decode."""
from document_extractor_spark.functions.textnorm import (
    decode_detect,
    decode_reference,
)


def test_reference_lossy_decode():
    # parity with open(..., encoding='utf-8', errors='ignore')
    # (reference pass_txt.py:30-31): invalid bytes silently dropped
    assert decode_reference("café".encode("latin-1")) == "caf"
    assert decode_reference("café".encode("utf-8")) == "café"
    assert decode_reference(None) == ""
    # BOM survives as ﻿, exactly like the reference's file read
    assert decode_reference(b"\xef\xbb\xbfhi") == "﻿hi"


def test_detect_bom():
    assert decode_detect(b"\xef\xbb\xbfhello") == ("hello", "utf-8-sig")
    assert decode_detect("hé".encode("utf-16-le").join([b"\xff\xfe", b""])) \
        == ("hé", "utf-16-le")


def test_detect_fallbacks():
    assert decode_detect("café".encode("utf-8")) == ("café", "utf-8")
    assert decode_detect("café".encode("latin-1")) == ("café", "latin-1")
    assert decode_detect(None) == ("", "none")
    # latin-1 is total: arbitrary bytes never raise
    assert decode_detect(bytes(range(128, 256)))[1] == "latin-1"
