"""Idempotent snapshot resume (S10).

The reference achieves idempotency destructively: on success it
deletes the source file so the watcher never re-sees it
(process_run.py:124-128, 194-197). A crash mid-CSV-append leaves
partial rows — nothing guards output_writer.py:230-257.

Spark replacement (north_rule: "resumes idempotently from the last
committed snapshot checkpoint"): outputs append to parquet and a tiny
`_manifest` parquet of committed urls is written LAST (commit point).
On restart, the input is anti-joined against the manifest, so only
never-committed urls are processed; a crash before the manifest write
re-processes that batch (at-least-once into an append dir, dedup on
read via the manifest). On a real deployment this maps 1:1 onto an
Iceberg snapshot commit; the parquet manifest is the sandbox stand-in
(SURVEY.md §4.4).

Scale note: the manifest carries only (url, run_id) — at 10^12 docs it
would itself be big, which is why the anti-join broadcasts *per-run*
manifests and the production path is an Iceberg metadata predicate,
not a data join. Here the anti-join is a shuffle-hash join Spark
plans automatically with AQE.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .io_tables import iceberg_catalog, read_table, write_table
from .pipeline import ExtractionResult, run_extraction


def _is_missing_path_error(exc: Exception) -> bool:
    """True only for 'nothing committed yet' shapes: a missing path or
    a dir holding no readable footer (crash during the FIRST manifest
    write leaves only _temporary/). Transient failures (S3 throttle,
    auth, network) must NOT match — swallowing them would silently
    disable resume and the next run_and_commit would re-extract and
    APPEND the whole input again, duplicating every output table."""
    s = str(exc)
    return any(tok in s for tok in (
        "PATH_NOT_FOUND", "FileNotFoundException", "NoSuchFileException",
        "UNABLE_TO_INFER_SCHEMA",  # dir exists but no committed footer
        "Path does not exist", "TABLE_OR_VIEW_NOT_FOUND"))


def committed_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    if iceberg_catalog(spark):
        try:
            return read_table(spark, "_manifest", out_dir)
        except Exception as exc:  # table not created yet = nothing committed
            if _is_missing_path_error(exc):
                return None
            raise
    manifest = os.path.join(out_dir, "_manifest")
    # read-probe instead of os.path checks: (a) out_dir may be a
    # remote fs (hdfs://, s3a://) the driver's local os module cannot
    # see — silently disabling resume; (b) a crash during the FIRST
    # manifest write can leave only _temporary/ behind, which passes a
    # listdir check but fails the parquet read forever after
    try:
        df = spark.read.parquet(manifest)
        df.take(1)
        return df
    except Exception as exc:  # absent or partial = nothing committed
        if _is_missing_path_error(exc):
            return None
        raise  # flaky read must ABORT, not duplicate output on re-run


def filter_uncommitted(
    spark: SparkSession, pages: DataFrame, out_dir: str
) -> DataFrame:
    """Anti-join input vs the committed manifest (the resume filter)."""
    manifest = committed_urls(spark, out_dir)
    if manifest is None:
        return pages
    return pages.join(manifest.select("url"), "url", "left_anti")


def run_and_commit(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
) -> ExtractionResult | None:
    """One incremental batch: resume-filter -> extract -> append ->
    commit manifest. Returns None when nothing is uncommitted.

    The returned result's branch cache is CALLER-OWNED (the caller
    usually consumes result.extracted further — chunk/JSONL exports);
    call result.unpersist() when done, as cli.main does — a per-batch
    scheduler that never releases it accumulates one full-batch cache
    per poll."""
    from .observability import job_params_table, log_phase

    cfg = cfg or PipelineConfig()
    log_phase("start", run_id=cfg.run_id, out_dir=out_dir)
    # persist: without it the pages scan + manifest anti-join re-run
    # three times (emptiness probe, the extraction job, the manifest
    # write) — two full input re-reads per incremental batch
    todo = filter_uncommitted(spark, pages, out_dir).persist()
    try:
        if not todo.take(1):
            # noop stays write-free: a scheduler polling a quiet
            # input must not append a banner batch per poll
            log_phase("noop", run_id=cfg.run_id)
            return None
        result = run_extraction(spark, todo, cfg)
        # io_tables routes each write to the configured Iceberg catalog
        # (atomic snapshot commits) or to parquet dirs under out_dir
        write_table(result.extracted, "extracted", out_dir)
        write_table(result.quarantine, "quarantine", out_dir)
        write_table(result.metrics, "metrics", out_dir)
        # commit point: manifest written last, after all data lands
        write_table(
            todo.select("url").withColumn("run_id", F.lit(cfg.run_id)),
            "_manifest", out_dir)
        # O2: the effective-config banner (entrypoint.sh:69-88) —
        # AFTER the manifest commit, so a params row implies the
        # batch it describes actually committed: a mid-run failure
        # before this point leaves no orphan banner, and the retry
        # (which re-runs the whole batch) writes the set exactly
        # once. The narrow crash window between manifest and banner
        # loses only the banner, never data integrity.
        write_table(job_params_table(spark, cfg), "job_params", out_dir)
        log_phase("commit", run_id=cfg.run_id)
        return result
    finally:
        todo.unpersist()
