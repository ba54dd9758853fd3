"""Interleaved A/B attribution bench (r3 verdict task #4).

Question: the r2->r3 per-query wall-time regressions on queries whose
code did NOT change (git-verified) — host drift or a hidden code
effect?  Protocol: run the suspect queries from the round-2 snapshot
tree (A) and the current tree (B) in ALTERNATING fresh subprocesses
on the IDENTICAL sf dir, several rounds.  Interleaving at session
granularity cancels the slow (minutes-scale) host drift this shared
box exhibits; per-query timing happens inside each subprocess after a
warm-up run, so session startup is excluded.

Usage: python scripts/ab_bench.py [A_TREE] [SF_DIR] [ROUNDS]
Prints one JSON line per (round, tree) and a final summary comparing
per-query MIN times (min is the only statistic that converges under
one-sided contention noise).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

QUERIES = [
    "embedding_neardup_lsh",
    "legacy_reliability",
    "repetition_ratios",
    "quality_scores",
    "training_filter_pipeline",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from document_extractor_spark.session import build_session
import __spark_entry__ as em
spark = build_session("ab", cores=int(sys.argv[4]))
spark.sparkContext.setLogLevel("ERROR")
qs = em.queries()
names = json.loads(sys.argv[3])
out = {}
for name in names:
    qs[name](spark, sys.argv[2]).write.format("noop").mode(
        "overwrite").save()           # warm: plan compile + page cache
    t0 = time.time()
    qs[name](spark, sys.argv[2]).write.format("noop").mode(
        "overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_tree(tree: str, sf_dir: str, cores: int) -> dict[str, float]:
    cp = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf_dir,
         json.dumps(QUERIES), str(cores)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": tree},
    )
    for line in cp.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}:\n{cp.stdout[-2000:]}"
                       f"\n{cp.stderr[-2000:]}")


def main() -> None:
    a_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_r2"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    b_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cores = int(os.getenv("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))

    results: dict[str, dict[str, list[float]]] = {
        "A": {q: [] for q in QUERIES}, "B": {q: [] for q in QUERIES}}
    for r in range(rounds):
        for label, tree in (("A", a_tree), ("B", b_tree)):
            got = run_tree(tree, sf_dir, cores)
            for q, t in got.items():
                results[label][q].append(t)
            print(json.dumps({"round": r, "tree": label, **got}))
    summary = {}
    for q in QUERIES:
        a, b = min(results["A"][q]), min(results["B"][q])
        summary[q] = {"r2_min": a, "now_min": b,
                      "ratio": round(b / a, 3) if a else None,
                      "r2_all": results["A"][q],
                      "now_all": results["B"][q]}
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
