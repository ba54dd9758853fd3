"""The end-to-end extraction pipeline as one declarative Spark plan.

Dataflow (the Spark re-expression of the reference's watcher ->
process_run -> pass_* -> output_writer DAG, SURVEY.md §3):

    pages ─ sniff fmt (Column expr, codegen)
      ├─ fmt=noise        → dropped silently (process_run.py:158-164)
      ├─ fmt=unsupported  → quarantine (process_run.py:166-171)
      ├─ fmt=pdf          → container explode → pdf text-layer branch
      ├─ fmt=html         → strict → lenient → raw cascade
      ├─ fmt=txt/pretext  → text branch
      └─ one BRANCH_SCHEMA stream
          ├─ granularity switch: per-doc row (array_join pages, JVM)
          │   or explode to per-page rows (pass_pdf.py:108-110)
          ├─ extracted table (status OK | ERROR)
          ├─ quarantine table (ERROR rows + unsupported)
          └─ metrics per partition (north_rule counters)

Two physical realizations of the same semantics:

- fused (default): ONE Arrow mapInPandas stage dispatches per row on
  the JVM-sniffed fmt and short-circuits the cascade internally.
  One scan, one Python stage, zero duplicate work — the right shape
  at 100 TB, where a staged cascade would re-execute upstream Python
  stages once per consumer and re-scan the table per branch.
- staged: the cascade and branches as separate filtered DataFrames
  (the literal structural twin of the reference's pass scripts).
  Kept for operator-level testing; tests assert fused == staged.

Scale notes (100 TB design):
- Dispatch and the final doc-text join are JVM-side (whole-stage
  codegen); Python runs only inside the Arrow-batched parse stage.
- The branch stream is persisted (MEMORY_AND_DISK) before fan-out to
  the three sinks, so extracted/quarantine/metrics share one pass.
  The persisted stream carries extracted text, never input binaries.
- The only shuffles in the whole job: the optional url-hash
  repartition and the metrics groupBy (tiny).
- AQE handles post-explode page-row skew from big documents.
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .functions.sniff import (
    FMT_DOC,
    FMT_DOCX,
    FMT_GZIP,
    FMT_HTML,
    FMT_IMG,
    FMT_PDF,
    FMT_PRETEXT,
    FMT_TXT,
    FMT_UNSUPPORTED,
    sniff_format,
)
from .operators.container import explode_containers
from .schemas import PAGES_COLS as _PAGES_COLS
from .operators.extract_branches import (
    BRANCH_SCHEMA,
    CASCADE_SCHEMA,
    make_doc_branch,
    make_docx_branch,
    make_extract_any,
    make_html_stage,
    make_pdf_branch,
    make_txt_branch,
)



@dataclass
class ExtractionResult:
    extracted: DataFrame
    quarantine: DataFrame
    metrics: DataFrame
    # the persisted branch stream the three tables derive from (None
    # when run_extraction(persist=False)): unpersisting the derived
    # DataFrames alone would leak the underlying cache
    branches: DataFrame | None = None

    def unpersist(self) -> None:
        # ONLY the factory-owned branch cache: run_extraction never
        # persists the derived frames, so unpersisting them here would
        # evict a cache the CALLER put on them (CLAUDE.md: never
        # unpersist a caller-owned cache)
        if self.branches is not None:
            try:
                self.branches.unpersist()
            except Exception:
                pass


def bucket_by_url_hash(df: DataFrame, buckets: int) -> DataFrame:
    """Explicit url-hash bucketing (north_rule). xxhash64 is uniform on
    unique urls, so extraction work balances regardless of domain skew;
    the salted path (operators/skew.py) is for keyed aggregations.

    buckets > 0: force that many buckets. buckets == 0 (auto): only
    repartition when the scan yields fewer splits than the cluster has
    cores — a wide input (the 100 TB case: thousands of parquet row
    groups) is left alone, because reshuffling raw binary payloads is
    pure waste; a narrow input (small corpus, one file) must be spread
    or every Arrow stage runs on one core. (A 4-waves-per-core policy
    was trialed against per-doc cost skew — PDFs cost many HTMLs —
    but interleaved A/B on this host showed the extra shuffle is a
    wash at best; at real scale AQE handles the tail.)
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    if buckets == 0:
        if df.rdd.getNumPartitions() >= parallelism:
            return df
        buckets = parallelism * 2
    elif buckets < 0:
        return df
    return df.repartition(buckets, F.pmod(F.xxhash64("url"), F.lit(buckets)))


def _staged_branches(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Structural cascade: separate mapInPandas per branch/stage.

    Each stage runs only on the previous remainder (payload carried
    through, nulled on accept) — the literal dataflow twin of
    pass_pdf.py:112-255. Used by tests; run_extraction defaults to
    the fused dispatcher.
    """
    sniffed = pages.withColumn(
        "fmt", sniff_format(F.col("html"), F.col("text")))

    pdf_stream = (
        sniffed.filter(F.col("fmt") == FMT_PDF)
        .drop("fmt")
        .mapInPandas(explode_containers, schema=pages.schema)
        .withColumn("fmt", sniff_format(F.col("html"), F.col("text")))
    )
    dispatched = sniffed.filter(
        F.col("fmt") != FMT_PDF).unionByName(pdf_stream)
    # gzip rows: decompress + inner dispatch is inherently per-row
    # recursive, so the staged path delegates that slice to the fused
    # kernel (identical semantics by construction). Container-child
    # gzip rows (they appear only after the explode re-sniff) carry
    # allow_container=False exactly like the fused dispatcher — a
    # gzip-wrapped portfolio INSIDE a portfolio must not explode a
    # second level (depth-1 contract).
    gzip_out = (
        sniffed.filter(F.col("fmt") == FMT_GZIP)
        .mapInPandas(make_extract_any(cfg), schema=BRANCH_SCHEMA)
        .unionByName(
            pdf_stream.filter(F.col("fmt") == FMT_GZIP)
            .mapInPandas(make_extract_any(cfg, allow_container=False),
                         schema=BRANCH_SCHEMA))
    )

    # image rows (top-level or container children): per-row OCR is
    # self-contained, so the staged path reuses the fused kernel on
    # the img slice (identical semantics by construction, like gzip)
    img_out = (
        dispatched.filter(F.col("fmt") == FMT_IMG)
        .mapInPandas(make_extract_any(cfg), schema=BRANCH_SCHEMA)
    )

    txt_rows = dispatched.filter(F.col("fmt").isin(FMT_TXT, FMT_PRETEXT))
    docx_rows = dispatched.filter(F.col("fmt") == FMT_DOCX)
    doc_rows = dispatched.filter(F.col("fmt") == FMT_DOC)
    pdf_rows = dispatched.filter(F.col("fmt") == FMT_PDF)
    html_rows = dispatched.filter(F.col("fmt") == FMT_HTML)
    unsupported = dispatched.filter(F.col("fmt") == FMT_UNSUPPORTED)

    txt_out = txt_rows.mapInPandas(make_txt_branch(cfg), schema=BRANCH_SCHEMA)
    docx_out = docx_rows.mapInPandas(
        make_docx_branch(cfg), schema=BRANCH_SCHEMA)
    doc_out = doc_rows.mapInPandas(
        make_doc_branch(cfg), schema=BRANCH_SCHEMA)
    pdf_out = pdf_rows.mapInPandas(make_pdf_branch(cfg), schema=BRANCH_SCHEMA)

    s1 = html_rows.mapInPandas(
        make_html_stage(cfg, "strict"), schema=CASCADE_SCHEMA)
    rest1 = s1.filter(~F.col("accepted")).select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"), "lang")
    s2 = rest1.mapInPandas(
        make_html_stage(cfg, "lenient"), schema=CASCADE_SCHEMA)
    rest2 = s2.filter(~F.col("accepted")).select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"), "lang")
    s3 = rest2.mapInPandas(
        make_html_stage(cfg, "raw", final=True), schema=CASCADE_SCHEMA)
    html_out = (
        s1.filter(F.col("accepted"))
        .unionByName(s2.filter(F.col("accepted")))
        .unionByName(s3)
        .drop("html", "accepted")
    )

    unsupported_out = unsupported.select(
        "url", "warc_ts", "lang",
        F.lit(FMT_UNSUPPORTED).alias("fmt"),
        F.lit("none").alias("method"),
        F.lit("ERROR").alias("status"),
        F.lit(False).alias("used_fallback"),
        F.lit(False).alias("per_page"),
        F.lit(0).alias("n_pages"),
        F.lit(None).cast(
            "array<struct<page:int,text:string,reliability:double>>"
        ).alias("pages"),
        F.lit(None).cast(
            "array<struct<start:bigint,end:bigint>>").alias("spans"),
        F.lit(0.0).alias("reliability"),
        F.lit("unsupported").alias("error"),
    )
    return (txt_out.unionByName(docx_out).unionByName(doc_out)
            .unionByName(pdf_out)
            .unionByName(html_out).unionByName(unsupported_out)
            .unionByName(gzip_out).unionByName(img_out))


def granularity_project(branches: DataFrame, run_id: str) -> DataFrame:
    """A7 granularity switch + E12 page-concat in ONE pass: per-doc
    rows become a single synthetic whole-doc page struct, then
    everything explodes.  Shared VERBATIM by the batch pipeline and
    the streaming plan (extracted_stream) — stream==batch depends on
    these being the same expressions, so there is exactly one copy."""
    doc_struct = F.struct(
        F.lit(None).cast("int").alias("page"),
        F.when(
            F.size("pages") > 0,
            F.array_join(
                F.transform("pages", lambda p: p["text"]), "\n", ""),
        ).otherwise(F.lit(None)).alias("text"),  # E12 "\n".join contract
        F.col("reliability").alias("reliability"),
    )
    pages_repr = F.when(F.col("per_page"), F.col("pages")).otherwise(
        F.array(doc_struct))
    return (
        branches.filter(F.col("fmt") != FMT_UNSUPPORTED)
        .select(
            "url", "lang", "fmt", "method", "status", "used_fallback",
            F.col("n_pages").alias("pages"), "spans", "error",
            F.col("reliability").alias("doc_reliability"),
            F.explode_outer(pages_repr).alias("p"),
        )
        .select(
            "url",
            F.lit(run_id).alias("run_id"),
            "fmt", "method", "status", "used_fallback", "pages",
            F.col("p.page").alias("page"),
            F.col("p.text").alias("text"),
            # per-page row span = that page's offsets in the doc text
            F.when(F.col("p.page").isNotNull(),
                   F.slice(F.col("spans"), F.col("p.page"), 1))
            .otherwise(F.col("spans")).alias("spans"),
            F.coalesce(F.col("p.reliability"), F.col("doc_reliability"))
            .alias("reliability"),
            "error",
        )
    )


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    mode: str = "fused",
    persist: bool = True,
) -> ExtractionResult:
    cfg = cfg or PipelineConfig()

    pages = pages.select(*_PAGES_COLS)
    pages = bucket_by_url_hash(pages, cfg.url_hash_buckets)

    if mode == "fused":
        sniffed = pages.withColumn(
            "fmt", sniff_format(F.col("html"), F.col("text")))
        branches = sniffed.mapInPandas(
            make_extract_any(cfg), schema=BRANCH_SCHEMA)
    else:
        branches = _staged_branches(pages, cfg)

    if persist:
        branches = branches.persist(StorageLevel.MEMORY_AND_DISK)

    extracted = granularity_project(branches, cfg.run_id)

    # --- quarantine (S8/R3): parse/gate failures + unsupported --------------
    quarantine = (
        branches.filter(
            (F.col("status") == "ERROR")
            & (~F.col("fmt").isin(FMT_TXT, FMT_PRETEXT)))
        .select(
            "url",
            F.regexp_extract("error", r"^([a-z_]+)", 1).alias("reason"),
            F.col("error").alias("note"),
        )
    )

    # --- per-partition lineage counters (north_rule) -------------------------
    metrics_in = branches.groupBy(
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
        .select(
            F.lit(cfg.run_id).alias("run_id"),
            "partition_id", "docs_in", "docs_out", "parse_failures",
            "bytes_extracted")
    )

    return ExtractionResult(extracted, quarantine, metrics,
                            branches if persist else None)


def extract_one(
    spark: SparkSession,
    pages: DataFrame,
    url: str,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Ad-hoc single-document debug path (reference §3.2: pass_any.sh
    routes one file through the same passes). Same pipeline, WHERE
    url = X; stage-forcing is done via cfg cutoff overrides, the
    analog of the probe wrappers setting PASS_*_CUTOFF=2
    (pass_pdf_ocr_a.sh:40-42)."""
    one = pages.filter(F.col("url") == url)
    return run_extraction(spark, one, cfg, persist=False).extracted
