"""Distributed heavy hitters: the Space-Saving sketch, merged.

The exact `groupBy(token).count()` answer needs a full shuffle whose
key cardinality is the open vocabulary — at 10^12 docs that is the
single biggest exchange in a corpus-profiling job, and usually all
anyone wants from it is the top few thousand tokens. Space-Saving
(Metwally et al., "Efficient computation of frequent and top-k
elements in data streams") keeps a capacity-bounded counter set with
a per-item overestimation bound; summaries MERGE, so the distributed
shape is:

  phase 1  per input partition, one capacity-k Space-Saving pass
           (Arrow-batched kernel, pure Python dict — no shuffle)
  phase 2  merge the P·k summary rows (dim-sized) by token: the
           merged estimate for a token is the sum of its per-
           partition estimates PLUS, for every partition where it
           was absent, that partition's minimum counter (the classic
           merge bound — an absent token could have been evicted
           with up to min_est mass). Lower bound = sum of
           (est - err) where present.

Guarantees (pinned in tests/test_heavyhitters.py):
- upper >= true count >= lower, always;
- any token with true count > N/k is in the summary;
- with capacity >= the partition's distinct-token count the sketch
  NEVER evicts: est is EXACT and err = 0, so the merged result
  equals the exact groupBy — which is how the driver oracle
  value-checks the whole pipeline (the same degenerate-exact trick
  as IVF's nprobe == n_cells).

Scale: phase 1 touches the corpus once with zero shuffles; phase 2
shuffles only P·k summary rows (dim-sized).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUMMARY_SCHEMA = ("part_id long, token string, est long, err long, "
                  "part_min long")

# unique fallback part ids for kernels running without a TaskContext
# (pid alone collides across reused workers)
import itertools as _itertools
import os as _os

_LOCAL_PART_COUNTER = _itertools.count(1 << 19)


def _next_local_part_id() -> int:
    # pid-qualified + monotonically unique within the process (a
    # bare generator here would break cloudpickle of the kernel)
    return (_os.getpid() << 20) + next(_LOCAL_PART_COUNTER)


def space_saving(counts: dict, capacity: int):
    """One Space-Saving update pass driver: `counts` maps token ->
    (est, err). Returns `(update, evicted)` where `evicted()` reports
    whether ANY eviction ever happened (a full-but-never-evicting
    sketch is still exact — the merge penalty must stay 0 for it).

    Eviction is O(log capacity) amortized via a lazy-deletion heap
    (stale entries skipped on pop; rebuilt when the heap outgrows
    4x capacity) — a per-eviction linear min-scan would make the
    lossy regime quadratic in the stream at real vocabularies.
    """
    import heapq

    # seed from any pre-existing entries (streaming state restore);
    # empty for a fresh sketch
    heap: list = [(e, t) for t, (e, _) in counts.items()]
    heapq.heapify(heap)
    state = {"evicted": False}

    def update(token: str) -> None:
        if token in counts:
            est, err = counts[token]
            counts[token] = (est + 1, err)
            heapq.heappush(heap, (est + 1, token))
        elif len(counts) < capacity:
            counts[token] = (1, 0)
            heapq.heappush(heap, (1, token))
        else:
            state["evicted"] = True
            while True:
                est, victim = heap[0]
                cur = counts.get(victim)
                if cur is not None and cur[0] == est:
                    break
                heapq.heappop(heap)  # stale
            heapq.heappop(heap)
            v_est, _ = counts.pop(victim)
            counts[token] = (v_est + 1, v_est)
            heapq.heappush(heap, (v_est + 1, token))
        if len(heap) > 4 * capacity:  # amortized size bound
            heap[:] = [(e, t) for t, (e, _) in counts.items()]
            heapq.heapify(heap)

    return update, lambda: state["evicted"]


def _phase1_kernel(text_col: str, capacity: int, tokenize):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one sketch per TASK (all Arrow batches of the partition)
        counts: dict = {}
        update, evicted = space_saving(counts, capacity)
        part_id = None
        for b in batches:
            if part_id is None:
                from pyspark import TaskContext
                ctx = TaskContext.get()
                # partitionId is unique within the job; the fallback
                # (no TaskContext: local/driver-side execution) must
                # be unique too — reused Python workers share a pid,
                # and a collided part_id would undercount total_min
                # and break the upper>=true bound
                part_id = (ctx.partitionId() if ctx
                           else _next_local_part_id())
            for text in b[text_col]:
                if text is None:
                    continue
                for tok in tokenize(text):
                    update(tok)
        if part_id is None or not counts:
            return  # empty partition: emit nothing
        # the merge penalty applies only if this sketch actually
        # LOST information: a full-but-never-evicting sketch is
        # exact and must not tax absent tokens
        part_min = min(est for est, _ in counts.values()) \
            if evicted() else 0
        yield pd.DataFrame([
            {"part_id": part_id, "token": t, "est": est, "err": err,
             "part_min": part_min}
            for t, (est, err) in counts.items()])
    return kernel


def _default_tokenize(text: str):
    # the repo's ONE pinned whitespace class (dedup.py) — str.split()
    # would also split on \xa0 etc. and diverge from the SQL twins
    from .dedup import _WS_SPLIT_RE

    return [t for t in _WS_SPLIT_RE.split(text.lower()) if t]


def heavy_hitters(docs: DataFrame, text_col: str = "text",
                  capacity: int = 4096, k: int = 20,
                  tokenize=_default_tokenize,
                  checkpoint_result: bool = True) -> DataFrame:
    """Top-k tokens with bounds:
    `(token, upper, lower, n_parts_present)`.

    `upper` orders the result (desc, then token asc for a
    deterministic tie-break), truncated to k rows. When no partition
    ever evicted (capacity >= per-partition vocab), upper == lower
    == the exact count.

    NB: `part_min` is only nonzero for partitions whose sketch
    filled; the absent-partition penalty sums those mins, so the
    exact regime is penalty-free by construction.
    """
    summaries = docs.select(text_col).mapInPandas(
        _phase1_kernel(text_col, capacity, tokenize), SUMMARY_SCHEMA)
    summaries = summaries.persist()
    try:
        total_min = (summaries.groupBy("part_id")
                     .agg(F.first("part_min").alias("m"))
                     .agg(F.sum("m")).collect()[0][0]) or 0
        merged = (
            summaries.groupBy("token")
            .agg(F.sum("est").alias("est_sum"),
                 F.sum(F.col("est") - F.col("err")).alias("lower"),
                 F.sum("part_min").alias("present_min"),
                 F.count("*").alias("n_parts_present"))
            # absent-partition penalty: total of all partition mins
            # minus the mins of partitions where the token IS present
            .select(
                "token",
                (F.col("est_sum") + (total_min - F.col("present_min")))
                .cast("long").alias("upper"),
                F.col("lower").cast("long").alias("lower"),
                F.col("n_parts_present").cast("long")
                .alias("n_parts_present"))
        )
        w = Window.orderBy(F.col("upper").desc(), F.col("token"))
        out = (merged.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= k).drop("_rn"))
        if checkpoint_result:
            # k-row result materialized; summaries cache released in
            # the finally. checkpoint_result=False exposes the live
            # plan (plan-shape tests) — the caller must consume it
            # before the cache is dropped
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        summaries.unpersist(blocking=False)
