"""Unified, strict output schemas.

The reference writes two *conflicting* CSV schemas into the same file
(12-col run index, process_run.py:21-34, vs 6-col legacy CsvWriter,
common.py:151-153) plus a ragged review manifest (2-col header,
process_run.py:74, 3-col rows, common.py:263-266). We normalize to
one strict StructType per table — no ragged rows possible (SURVEY.md
§1.2 decision).
"""
from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- input table (BASELINE.json input_hint) -------------------------------
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# span offsets of kept content blocks in decoded source order
SPAN_TYPE = ArrayType(StructType([
    StructField("start", LongType(), False),
    StructField("end", LongType(), False),
]))

# page structs before granularity switch (reference payload dicts
# {"pages": [{"page", "text", "reliability"}]}, pass_pdf_txt.py:8-10)
PAGE_STRUCT = ArrayType(StructType([
    StructField("page", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("reliability", DoubleType(), True),
]))

# --- unified output index (normalizes the reference's 12-col CSV,
# process_run.py:21-34 / output_writer.py:230-257) -------------------------
EXTRACTED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("run_id", StringType(), False),
    StructField("fmt", StringType(), True),       # sniffed format
    StructField("method", StringType(), True),    # pass_used analog
    StructField("status", StringType(), True),    # OK | ERROR
    StructField("used_fallback", BooleanType(), True),  # used_ocr analog
    StructField("pages", IntegerType(), True),    # page count
    StructField("page", IntegerType(), True),     # NULL = whole-doc row
    StructField("text", StringType(), True),
    StructField("spans", SPAN_TYPE, True),
    StructField("reliability", DoubleType(), True),
])

# --- quarantine (normalized review_manifest, common.py:263-266) ------------
QUARANTINE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("reason", StringType(), False),
    StructField("note", StringType(), True),
])

# --- per-partition lineage counters (north_rule metrics table) --------------
METRICS_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("docs_in", LongType(), True),
    StructField("docs_out", LongType(), True),
    StructField("parse_failures", LongType(), True),
    StructField("bytes_extracted", LongType(), True),
])


# canonical pages column order (shared by pipeline + container explode)
PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]
