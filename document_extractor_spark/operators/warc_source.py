"""WARC file source: explode binary WARC blobs into per-record rows.

The Spark-native entry point for Common-Crawl-style input
(BASELINE.json north_star): upstream, each row carries one WARC file
as an opaque ``binary`` column (e.g. from
``spark.read.format("binaryFile")`` over a crawl bucket); this
operator fans each file out into one row per contained record via an
Arrow-batched ``mapInPandas`` kernel over the from-scratch parser in
:mod:`..functions.warc_mini`.

Design points for 100 TB:

- WARC files are the parallelism unit (Common Crawl ships ~1 GB
  files; a 100 TB crawl is ~10^5 files → ample partitions). The
  kernel is embarrassingly parallel: no shuffle is introduced —
  rows explode inside the scan stage and downstream dispatch
  (functions/sniff.py) consumes them directly.
- the kernel yields one output frame per input FILE (never
  accumulating a whole Arrow batch of files), so peak Python memory
  is one file's decompressed records — bounded by the per-member
  decompression budget times the file's record count — plus the one
  compressed input row Arrow hands over. Files, not batches, are
  the memory unit; ``maxFilesPerTrigger``/``maxPartitionBytes``
  bound how many files a task holds.
- Malformed records become quarantine rows (``error`` set) instead
  of failing the task — one bad record in a 1 GB file must not
  re-run the partition. Mirrors the reference's per-file quarantine
  (process_run.py error branch) at record granularity.

Output schema (``WARC_ROWS_SCHEMA``) is pages-shaped: ``url``/
``warc_ts``-compatible fields plus HTTP metadata, so the result
feeds the extraction pipeline after a rename/cast projection
(:func:`warc_pages`).
"""
from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.warc_mini import parse_warc

WARC_ROWS_SCHEMA = (
    "warc_id long, rec_idx int, url string, warc_date string, "
    "warc_type string, http_status int, http_content_type string, "
    "payload binary, error string"
)


def _explode_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = ["warc_id", "rec_idx", "url", "warc_date", "warc_type",
            "http_status", "http_content_type", "payload", "error"]
    for b in batches:
        # one yielded frame per FILE: a batch-wide row list would hold
        # every file's decompressed records at once (see module doc)
        for r in b.itertuples(index=False):
            rows = [{
                "warc_id": r.warc_id,
                "rec_idx": i,
                "url": rec.target_uri,
                "warc_date": rec.warc_date,
                "warc_type": rec.warc_type,
                "http_status": rec.http_status,
                "http_content_type": rec.http_content_type,
                "payload": rec.payload,
                "error": rec.error,
            } for i, rec in enumerate(parse_warc(r.warc))]
            yield pd.DataFrame(rows, columns=cols)


def docs_to_warc_blobs(docs: DataFrame, n_files: int = 8,
                       payload_col: str | None = None,
                       content_type: str = "text/plain; charset=utf-8",
                       ) -> DataFrame:
    """Deterministically pack `documents(doc_id, text)` into synthetic
    WARC files: `(warc_id long, warc binary)`, one gzip member per
    record (the Common Crawl layout).

    Fixture synthesis for tests and the driver oracle — every field
    is a pure function of ``doc_id`` (uri, capture date, HTTP status)
    or of the payload, so a SQL oracle can recompute the expected
    parse output arithmetically without ever seeing the bytes; the
    Spark side must round-trip through the real serializer AND the
    real parser to match it. Distributed build (``applyInPandas``
    per warc_id group), no driver collection.

    ``payload_col`` names a BINARY column to carry as the HTTP body
    (e.g. pre-rendered HTML for a full crawl→extraction fixture);
    default is the utf-8 bytes of ``text``.
    """
    from ..functions.warc_mini import build_response_record, build_warc

    def _pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for r in pdf.sort_values("doc_id").itertuples(index=False):
            doc_id = int(r.doc_id)
            uri = f"http://site{doc_id % 40}.example.com/doc/{doc_id}"
            date = (
                datetime(2026, 1, 1) + timedelta(minutes=doc_id)
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            status = 404 if doc_id % 13 == 0 else 200
            if payload_col is not None:
                payload = bytes(getattr(r, payload_col) or b"")
            else:
                payload = (r.text or "").encode("utf-8")
            recs.append(build_response_record(
                uri, date, payload, http_status=status,
                http_content_type=content_type))
        return pd.DataFrame(
            {"warc_id": [int(key[0])],
             "warc": [build_warc(recs, per_record_gzip=True)]})

    carry = payload_col if payload_col is not None else "text"
    return (
        docs.select("doc_id", carry,
                    (F.col("doc_id") % n_files).alias("warc_id"))
        .groupBy("warc_id")
        .applyInPandas(_pack, "warc_id long, warc binary")
    )


def warc_records(warc_files: DataFrame) -> DataFrame:
    """`(warc_id long, warc binary)` → one row per WARC record.

    Error placeholders (parse failures) come through with ``error``
    set and the other fields NULL — filter or quarantine downstream.
    """
    return warc_files.mapInPandas(_explode_kernel, WARC_ROWS_SCHEMA)


def warc_pages(warc_files: DataFrame,
               require_status: int | None = None) -> DataFrame:
    """WARC files → the pipeline's `pages` input shape.

    Keeps only well-formed `response` records (the reference extracts
    documents, not request/metadata records), maps the HTTP body to
    the ``html`` binary column and the WARC capture date to
    ``warc_ts``. ``lang``/``text`` start NULL — the pipeline fills
    them. ``require_status`` additionally keeps only records with
    that HTTP status (e.g. 200 to drop 404/5xx captures).
    """
    recs = warc_records(warc_files)
    keep = (F.col("error").isNull()
            & (F.col("warc_type") == "response")
            & F.col("url").isNotNull())
    if require_status is not None:
        keep = keep & (F.col("http_status") == require_status)
    return (
        recs
        .filter(keep)
        .select(
            F.col("url"),
            # 'X' parses the trailing Z as a real UTC offset, so the
            # instant is correct on ANY session timezone — a 'Z'
            # literal pattern would re-interpret the wall time in the
            # session zone and shift the streaming-dedup watermark
            # column on non-UTC clusters (ADVICE r3)
            F.to_timestamp(
                F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX"
            ).alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
