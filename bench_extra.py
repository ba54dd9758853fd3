"""Optimization-round measurement harness (guide §1.4): times
individual declared queries against an arbitrary sf dir with the
noop sink, labels jobs, and can dump `.explain("formatted")`.

bench.py is FROZEN for driver measurement; this file exists so the
optimization loop can isolate queries (and run at driver-like scale
via scripts/make_scaled_sf.py) without touching it.

Usage:
  python bench_extra.py DIR [-n REPEATS] [--explain OUTDIR] [query ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_extractor_spark.session import build_session  # noqa: E402

HOT = [
    "semdedup", "cluster_balanced_sample", "ocr_best_of_rotations",
    "ocr_roundtrip", "neardup_dedup_pipeline", "incremental_minhash",
    "ccnet_buckets", "embedding_neardup_lsh", "charlm_cross_entropy",
    "ngram_jaccard", "legacy_reliability", "dsir_select",
    "minhash_dedup_pipeline", "cdc_chunks", "gopher_repetition",
    "softdedup_weights", "repetition_ratios", "bm25_topk",
    "quality_keeper_dedup", "hashed_embeddings", "dom_blocks",
    "gopher_quality", "link_pagerank", "pii_redact",
    "nb_quality_classifier", "token_windows", "dup_window_spans",
    "heavy_hitters", "inverted_index", "top_docs_per_source",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="dir to write <query>.txt formatted plans")
    args = ap.parse_args()

    cpus = int(os.getenv("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = build_session(app_name="des-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries or [q for q in HOT if q in qs]
    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", flush=True)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
