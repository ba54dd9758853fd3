"""document_extractor_spark — a PySpark-native main-content extraction engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference `strahd-zarovich/document-extractor`
(a single-node file-watcher extraction container), re-expressed as
declarative Spark DataFrame pipelines:

- format dispatch by magic-byte sniff (reference: process_run.py:93-109
  routes by file extension) as a pure Column expression,
- HTML main-content extraction with text-density / link-density block
  scoring (boilerpipe-style) over Arrow-batched ``mapInPandas``,
- a from-scratch pdfminer-style PDF text-layer parser (reference:
  common.py:332-350 uses PyMuPDF) — pure Python, executor-safe,
- the reference's accept/escalate cascade (pass_pdf.py:112-255
  TXT -> OCR-A -> OCR-B) re-expressed as filtered-union dataflow
  (strict -> lenient -> raw HTML passes),
- reliability scoring / exact-median gating (common.py:194-214),
- granularity switch, chunk bin-packing, quarantine, idempotent
  resume, per-partition metrics (north_rule counters),
- plus training-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding near-dup), similarity search,
  text analysis (language-ID, quality, token counts, fingerprints),
  multimodal column plumbing.

Designed for a multi-executor cluster at ~100 TB scale; tested on
local[N].
"""

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "run_extraction",
    "extract_one",
    "run_and_commit",
    "build_session",
]


def __getattr__(name):  # lazy: importing the package must not need a JVM
    if name == "PipelineConfig":
        from .config import PipelineConfig
        return PipelineConfig
    if name in ("run_extraction", "extract_one"):
        from . import pipeline
        return getattr(pipeline, name)
    if name == "run_and_commit":
        from .checkpoint import run_and_commit
        return run_and_commit
    if name == "build_session":
        from .session import build_session
        return build_session
    raise AttributeError(name)
