"""Run-level artifact rendering (reference output sinks S5-S7).

The reference materializes three things per run (output_writer.py):
a CSV index row per doc, a per-doc rendered .txt, and size-bounded
combined chunk files. Here they are *tables*, not files:

- the extracted table IS the index (S5),
- `rendered_docs` adds the byte-parity rendered text block per doc
  (S6: header + `=== [PAGE n] ===` sections, chunker.render_doc_text),
- `chunked_docs` assigns greedy never-split chunk ids over the
  rendered blocks (S7/A9) — `partitionBy(chunk_id)` on write yields
  one file per chunk when actual .txt export is wanted.

Everything is JVM-or-Arrow batched; the render is a grouped
reconstruction of page order per url (the reference renders at write
time per doc, output_writer.py:168-193).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.chunker import DOCUMENT_BREAK, assign_chunks, render_doc_text


def rendered_docs(extracted: DataFrame,
                  processed_at: str = "1970-01-01T00:00:00Z") -> DataFrame:
    """One row per url with the reference-parity rendered text block.

    Per-page rows are regrouped into page order; per-doc rows render
    as a single page 1 (the reference's per-doc mode,
    pass_pdf.py:122-129). `processed_at` is injected (deterministic
    runs; the reference stamps wall-clock, output_writer.py:147 — a
    documented non-determinism exclusion, SURVEY.md §7.3).
    """
    ok = extracted.filter(
        (F.col("status") == "OK") & F.col("text").isNotNull())
    paged = ok.select(
        "url", "run_id", "method", "status", "reliability",
        F.struct(
            F.coalesce(F.col("page"), F.lit(1)).alias("page"),
            F.col("text").alias("text"),
        ).alias("pg"),
    )
    grouped = paged.groupBy("url", "run_id", "method", "status").agg(
        F.max("reliability").alias("reliability"),
        F.array_sort(F.collect_list("pg")).alias("pages"),
    )

    @F.udf("string")
    def _render(url, method, score, status, pages):
        return render_doc_text(
            url=url,
            relative_path=url.split("://", 1)[-1],
            pages=[(p["page"], p["text"]) for p in pages],
            pass_used=method,
            score=score,
            status=status,
            processed_at=processed_at,
        )

    return grouped.select(
        "url", "run_id", "method", "status", "reliability",
        _render("url", "method", "reliability", "status", "pages")
        .alias("rendered_text"),
    )


def chunked_docs(rendered: DataFrame,
                 max_bytes: int = 3_000_000) -> DataFrame:
    """Greedy never-split chunk assignment over rendered blocks
    (+ the document break the reference appends between docs,
    output_writer.py:217-219)."""
    sized = rendered.withColumn(
        "doc_bytes",
        F.octet_length("rendered_text")
        + F.lit(len(DOCUMENT_BREAK.encode("utf-8"))))
    return assign_chunks(sized, max_bytes=max_bytes,
                         run_col="run_id", order_col="url",
                         size_col="doc_bytes")
