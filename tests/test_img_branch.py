"""Image/OCR extraction branch: routing, cascade attribution,
cutoff gating, quarantine reasons."""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from document_extractor_spark.config import PipelineConfig
from document_extractor_spark.functions.bitfont import (
    encode_png_gray,
    normalize_content,
    render_scan,
)
from document_extractor_spark.functions.sniff import sniff_format
from document_extractor_spark.operators.extract_branches import (
    _img_core,
    sniff_bytes,
)
from document_extractor_spark.pipeline import run_extraction


def test_png_routes_to_img(spark):
    payload = render_scan("hello")
    assert sniff_bytes(payload, None) == "img"
    df = spark.createDataFrame(
        [("u", payload)], "url string, html binary")
    [r] = df.select(sniff_format(
        F.col("html"), F.lit(None).cast("string")).alias("fmt")).collect()
    assert r["fmt"] == "img"


def test_img_core_accept_and_fallback():
    cfg = PipelineConfig()
    text = "A perfectly ordinary sentence for the scanner."
    want = normalize_content(text)
    r = _img_core("u", None, "en", render_scan(text), cfg)
    assert (r["method"], r["status"], r["used_fallback"]) == \
        ("ocr_a", "OK", False)
    assert r["pages"][0][1] == want
    r = _img_core("u", None, "en", render_scan(text, rotate=True), cfg)
    assert (r["method"], r["status"], r["used_fallback"]) == \
        ("ocr_b", "OK", True)
    assert r["pages"][0][1] == want


def test_img_core_below_cutoff():
    cfg = PipelineConfig()
    # almost no alphanumerics -> reliability far below img_cutoff
    r = _img_core("u", None, "en",
                  render_scan("!!! ??? *** ### $$$ %%%"), cfg)
    assert r["status"] == "ERROR" and r["error"] == "extract_below_cutoff"
    assert r["reliability"] < cfg.img_cutoff


def test_img_core_parse_failures():
    cfg = PipelineConfig()
    r = _img_core("u", None, "en", render_scan("x")[:40], cfg)
    assert (r["method"], r["error"]) == ("none", "img_parse_failed")
    r = _img_core("u", None, "en", None, cfg)
    assert r["error"] == "img_parse_failed"


def test_img_rows_flow_to_quarantine(spark):
    import numpy as np
    cfg = PipelineConfig(run_id="t-img")
    rows = [
        ("ok", None, render_scan("good scan page content here"), None, "en"),
        ("bad", None, render_scan("y")[:40], None, "en"),
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]))
    res = run_extraction(spark, pages, cfg, persist=False)
    ext = {r["url"]: r for r in res.extracted.collect()}
    assert ext["ok"]["status"] == "OK" and ext["ok"]["method"] == "ocr_a"
    q = {r["url"]: r["reason"] for r in res.quarantine.collect()}
    assert q == {"bad": "img_parse_failed"}
