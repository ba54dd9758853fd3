"""The end-to-end extraction pipeline as one declarative Spark plan.

Dataflow (the Spark re-expression of the reference's watcher ->
process_run -> pass_* -> output_writer DAG, SURVEY.md §3):

    pages ─ sniff fmt (Column expr, codegen)
      ├─ fmt=noise        → dropped silently (process_run.py:158-164)
      ├─ fmt=unsupported  → quarantine (process_run.py:166-171)
      ├─ fmt=pdf          → container explode → re-sniff children
      │                      → pdf text-layer branch (median gate)
      ├─ fmt=html         → strict → lenient → raw cascade
      ├─ fmt=txt/pretext  → text branch
      └─ unionByName of all branches
          ├─ granularity switch: per-doc row (array_join pages, JVM)
          │   or posexplode to per-page rows (pass_pdf.py:108-110)
          ├─ extracted table (status OK | ERROR)
          ├─ quarantine table (ERROR rows + unsupported)
          └─ metrics per partition (north_rule counters)

Scale notes (100 TB design):
- Dispatch and the final doc-text join are JVM-side (whole-stage
  codegen); Python runs only inside Arrow-batched mapInPandas parses.
- Every branch is a narrow pipeline over the sniffed scan — the only
  shuffles in the whole job are the optional url-hash repartition and
  the metrics groupBy (tiny).
- Cascade stages carry the payload only for remainder rows (nulled on
  accept), so stage k's Arrow traffic shrinks to the escalation rate.
- AQE handles post-explode page-row skew from big documents.
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .functions.sniff import (
    FMT_HTML,
    FMT_NOISE,
    FMT_PDF,
    FMT_PRETEXT,
    FMT_TXT,
    FMT_UNSUPPORTED,
    sniff_format,
)
from .operators.container import explode_containers
from .operators.extract_branches import (
    BRANCH_SCHEMA,
    CASCADE_SCHEMA,
    make_html_stage,
    make_pdf_branch,
    make_txt_branch,
)

_PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]


@dataclass
class ExtractionResult:
    extracted: DataFrame
    quarantine: DataFrame
    metrics: DataFrame


def bucket_by_url_hash(df: DataFrame, buckets: int) -> DataFrame:
    """Explicit url-hash bucketing (north_rule). xxhash64 is uniform on
    unique urls, so extraction work balances regardless of domain skew;
    the salted path (operators/skew.py) is for keyed aggregations."""
    if buckets <= 0:
        return df
    return df.repartition(buckets, F.pmod(F.xxhash64("url"), F.lit(buckets)))


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
) -> ExtractionResult:
    cfg = cfg or PipelineConfig()

    pages = pages.select(*_PAGES_COLS)
    pages = bucket_by_url_hash(pages, cfg.url_hash_buckets)
    sniffed = pages.withColumn("fmt", sniff_format(F.col("html"), F.col("text")))

    # --- container explode (S9) then re-sniff children ---------------------
    pdf_stream = (
        sniffed.filter(F.col("fmt") == FMT_PDF)
        .drop("fmt")
        .mapInPandas(explode_containers, schema=pages.schema)
        .withColumn("fmt", sniff_format(F.col("html"), F.col("text")))
    )
    non_pdf = sniffed.filter(F.col("fmt") != FMT_PDF)
    dispatched = non_pdf.unionByName(pdf_stream)

    # --- branches -----------------------------------------------------------
    txt_rows = dispatched.filter(F.col("fmt").isin(FMT_TXT, FMT_PRETEXT))
    pdf_rows = dispatched.filter(F.col("fmt") == FMT_PDF)
    html_rows = dispatched.filter(F.col("fmt") == FMT_HTML)
    unsupported = dispatched.filter(F.col("fmt") == FMT_UNSUPPORTED)
    # fmt=noise rows are dropped here and never appear in any output
    # (reference deletes .wav on sight, process_run.py:158-164)
    _ = FMT_NOISE

    txt_out = txt_rows.mapInPandas(make_txt_branch(cfg), schema=BRANCH_SCHEMA)
    pdf_out = pdf_rows.mapInPandas(make_pdf_branch(cfg), schema=BRANCH_SCHEMA)

    # html cascade: each stage consumes the previous remainder only
    s1 = html_rows.mapInPandas(
        make_html_stage(cfg, "strict"), schema=CASCADE_SCHEMA)
    acc1 = s1.filter(F.col("accepted"))
    rest1 = s1.filter(~F.col("accepted")).select(
        "url", "warc_ts", "html", F.lit(None).cast("string").alias("text"),
        "lang")
    s2 = rest1.mapInPandas(
        make_html_stage(cfg, "lenient"), schema=CASCADE_SCHEMA)
    acc2 = s2.filter(F.col("accepted"))
    rest2 = s2.filter(~F.col("accepted")).select(
        "url", "warc_ts", "html", F.lit(None).cast("string").alias("text"),
        "lang")
    s3 = rest2.mapInPandas(
        make_html_stage(cfg, "raw", final=True), schema=CASCADE_SCHEMA)
    html_out = (
        acc1.unionByName(acc2).unionByName(s3)
        .drop("html", "accepted")
    )

    branches = txt_out.unionByName(pdf_out).unionByName(html_out)

    # --- granularity switch (A7) -------------------------------------------
    doc_rows = branches.filter(~F.col("per_page")).select(
        "url", "lang", "fmt", "method", "status", "used_fallback",
        F.col("n_pages").alias("pages"),
        F.lit(None).cast("int").alias("page"),
        F.when(
            F.size("pages") > 0,
            F.array_join(
                F.transform("pages", lambda p: p["text"]), "\n", ""),
        ).otherwise(F.lit(None)).alias("text"),  # E12 "\n".join contract
        "spans",
        "reliability",
        "error",
    )
    page_rows = (
        branches.filter(F.col("per_page"))
        .select(
            "url", "lang", "fmt", "method", "status", "used_fallback",
            F.col("n_pages").alias("pages"), "error", "spans",
            F.col("reliability").alias("doc_reliability"),
            F.explode_outer("pages").alias("p"),
        )
        .select(
            "url", "lang", "fmt", "method", "status", "used_fallback",
            "pages",
            F.col("p.page").alias("page"),
            F.col("p.text").alias("text"),
            # per-page row span = that page's offsets in the doc text
            F.when(
                F.col("p.page").isNotNull(),
                F.slice(F.col("spans"), F.col("p.page"), 1),
            ).otherwise(F.lit(None)).alias("spans"),
            F.coalesce(F.col("p.reliability"), F.col("doc_reliability"))
            .alias("reliability"),
            "error",
        )
    )
    extracted = (
        doc_rows.unionByName(page_rows)
        .withColumn("run_id", F.lit(cfg.run_id))
        .select(
            "url", "run_id", "fmt", "method", "status", "used_fallback",
            "pages", "page", "text", "spans", "reliability", "error",
        )
    )

    # --- quarantine (S8/R3): parse/gate failures + unsupported --------------
    quarantine = (
        branches.filter(
            (F.col("status") == "ERROR") & (F.col("fmt") != FMT_TXT))
        .select(
            "url",
            F.regexp_extract("error", r"^([a-z_]+)", 1).alias("reason"),
            F.col("error").alias("note"),
        )
        .unionByName(
            unsupported.select(
                "url",
                F.lit("unsupported").alias("reason"),
                F.lit("format not supported").alias("note"),
            )
        )
    )

    # --- per-partition lineage counters (north_rule) -------------------------
    metrics_in = dispatched.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(F.count("*").alias("docs_in"))
    metrics_out = extracted.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(
        F.count("*").alias("docs_out"),
        F.sum((F.col("status") == "ERROR").cast("long"))
        .alias("parse_failures"),
        F.sum(F.coalesce(F.octet_length("text"), F.lit(0)).cast("long"))
        .alias("bytes_extracted"),
    )
    metrics = (
        metrics_in.join(metrics_out, "partition_id", "full_outer")
        .withColumn("run_id", F.lit(cfg.run_id))
        .select("run_id", "partition_id", "docs_in", "docs_out",
                "parse_failures", "bytes_extracted")
    )

    return ExtractionResult(extracted, quarantine, metrics)
