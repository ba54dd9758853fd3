"""Benchmark harness. Prints ONE JSON line:
{"metric": "extraction_e2e_sec", "value": <sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": <sf>,
 "docs_per_sec": ..., "scaling": {...N vs 4N evidence...}}

Headline: the full extraction pipeline (sniff -> container explode ->
cascade -> gate -> union) over a seeded synthetic pages corpus sized
to the sf, written to a noop sink (full execution, no collect).

Scaling evidence (BASELINE.md criterion, sandbox realization): the
same job at N=cpus/4 and 4N=cpus cores; efficiency =
throughput(4N) / (4 * throughput(N)). Disable with SPARK_GRAFT_SCALING=0.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_extractor_spark.config import PipelineConfig  # noqa: E402
from document_extractor_spark.corpus import write_corpus  # noqa: E402
from document_extractor_spark.session import build_session  # noqa: E402

SF_DIR = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.getenv("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))

BENCH_QUERIES = [
    "extract_html_roundtrip",
    "pricing_summary",
    "top_revenue_nations",
    "coverage_summary",
    "chunk_pack_cumsum",
    "sessionize_events",
    "hourly_rollup",
    "dedup_exact",
    "minhash_lsh_buckets",
    "ngram_jaccard",
    "ann_cosine_topk",
    "quality_scores",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _corpus_dir(n: int) -> str:
    cdir = f"/tmp/des_bench_corpus_{n}_s42"
    if not os.path.exists(f"{cdir}/pages.parquet"):
        write_corpus(cdir, n, seed=42)
    return cdir


def _run_extraction(spark, corpus_dir: str) -> float:
    from document_extractor_spark.pipeline import run_extraction

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    cfg = PipelineConfig(run_id="bench")
    t0 = time.time()
    res = run_extraction(spark, pages, cfg)
    res.extracted.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_docs = max(2000, int(200_000 * sf))
    corpus_dir = _corpus_dir(n_docs)

    spark = build_session(app_name="des-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Arrow path once with a small slice
    _run_extraction(spark, _corpus_dir(2000))

    # --- headline: extraction throughput at full parallelism ----------------
    e2e = _run_extraction(spark, corpus_dir)
    docs_per_sec = round(n_docs / e2e, 2)

    # --- per-query timings on the sf tables ---------------------------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    query_secs: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        query_secs[name] = round(time.time() - t0, 3)

    # --- scaling: N vs 4N cores (two-cluster-size criterion) ----------------
    scaling = None
    if os.getenv("SPARK_GRAFT_SCALING", "1") != "0" and CPUS >= 4:
        spark.stop()
        small = max(1, CPUS // 4)
        spark_small = build_session(app_name="des-bench-small", cores=small)
        spark_small.sparkContext.setLogLevel("ERROR")
        _run_extraction(spark_small, _corpus_dir(2000))  # warm
        t_small = _run_extraction(spark_small, corpus_dir)
        spark_small.stop()
        tput_small = n_docs / t_small
        tput_big = docs_per_sec
        scaling = {
            "cores_small": small,
            "cores_big": CPUS,
            "docs_per_sec_small": round(tput_small, 2),
            "docs_per_sec_big": tput_big,
            "efficiency": round(tput_big / (tput_small * (CPUS / small)), 4),
        }

    print(json.dumps({
        "metric": "extraction_e2e_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "cores": CPUS,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
