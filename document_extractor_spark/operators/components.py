"""Connected components over near-duplicate pair graphs.

Every dedup pair generator in this engine (minhash-LSH, simhash
blocks, n-gram Jaccard, embedding LSH) emits EDGES; an actual dedup
decision needs the transitive closure — if A~B and B~C, all three are
one duplicate cluster and exactly one representative survives. This
module computes components with iterative min-label propagation, the
standard distributed formulation (Kiveris et al. 2014's
large-star/small-star adds star-contraction speedups that bring the
round count to O(log n); plain propagation needs ~component-diameter
rounds, which is small for near-dup graphs — duplicate clusters are
dense and shallow, not long chains).

Determinism: the fixpoint (every node labeled with the smallest node
id reachable from it) is unique — independent of iteration count,
partitioning, or execution order — so the result is reproducible and
oracle-checkable (DuckDB recursive-CTE transitive closure).

Scale shape per round: one groupBy(node) over the (undirected) edge
list joined with current labels — 2 shuffles per round, all
equi-joins, no nested loops. The convergence probe is a single
count() per round (an O(rounds) driver-side scalar, not a collect of
data). Rounds are capped; exhausting the cap RAISES rather than
returning unconverged labels, because an unconverged result silently
splits true clusters.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def connected_components(edges: DataFrame, a_col: str = "a",
                         b_col: str = "b",
                         max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(node, component) for every node in `edges`, component = min
    reachable node id. Nodes appear even if their only edge is a
    self-loop; callers union isolated nodes afterwards if needed.
    """
    und = (
        edges.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .union(edges.select(F.col(b_col).alias("s"),
                            F.col(a_col).alias("d")))
        .distinct()
    )
    # localCheckpoint (not persist): an iterative self-join DOUBLES
    # the logical plan every round, and Catalyst re-analyzes the full
    # lineage at each action — by round ~10 the plan tree alone OOMs
    # the driver. Checkpointing cuts lineage so every round starts
    # from a flat scan of materialized blocks. (On a real cluster,
    # reliable checkpoint() to HDFS trades speed for executor-loss
    # tolerance; localCheckpoint is the right call for bounded loops.)
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_rounds):
        # each node pulls the smallest label among itself and its
        # neighbours
        neigh = (
            und.join(labels.withColumnRenamed("node", "d"), "d")
            .select(F.col("s").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"),
                            "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning unconverged labels would silently split true
        # clusters (multiple "keepers" inside one duplicate group) —
        # a correctness failure, not a perf knob. Note max_rounds
        # counts DETECTION rounds: the fixpoint needs ~diameter
        # rounds plus one final no-change round to prove itself, so
        # the usable cap is max_rounds-1 propagation rounds. Labels
        # that stabilized exactly on the last round still raise —
        # correct-but-unproven is indistinguishable from wrong here.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_rounds} rounds (diameter+1 rounds needed — the "
            f"final round must observe zero changes); raise "
            f"max_rounds")
    return labels.select("node", "comp")


def dedup_decision(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "id_a", pair_b: str = "id_b"
                   ) -> DataFrame:
    """(id, component, is_keeper) for every document: transitive
    near-dup closure over `pairs`, keeper = smallest id per cluster;
    docs without any pair keep themselves (singleton component)."""
    comp = connected_components(pairs, pair_a, pair_b)
    return (
        docs.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("comp"), F.col("node")).alias("component"))
        .withColumn("is_keeper", F.col("component") == F.col(id_col))
    )
