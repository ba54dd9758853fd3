"""Connected components over near-duplicate pair graphs.

Every dedup pair generator in this engine (minhash-LSH, simhash
blocks, n-gram Jaccard, embedding LSH) emits EDGES; an actual dedup
decision needs the transitive closure — if A~B and B~C, all three are
one duplicate cluster and exactly one representative survives. This
module computes components with the alternating large-star /
small-star algorithm (Kiveris et al. 2014, "Connected Components in
MapReduce and Beyond"), which converges in O(log^2 n) rounds
REGARDLESS of component diameter — an adversarial duplicate chain
(scraped pagination series, near-identical rolling snapshots) that
would cost plain min-label propagation one round per hop costs this
formulation a handful of rounds (a 4000-hop path converges in ~14).

Per round, on the current edge set E:
  large-star  for every node u, every neighbour v > u is re-pointed
              at m = min(N(u) ∪ {u}) — long-range shortcuts appear;
  small-star  every edge is oriented big→small and each node's
              smaller neighbours (plus itself) are re-pointed at its
              minimum smaller neighbour — local fan-in flattens.
Both preserve connectivity; the unique fixpoint is a star forest
with every component's minimum id at the centre, so the final edge
list IS the (node → component) map. A full round that changes
nothing proves the fixpoint.

Determinism: the fixpoint (every node labeled with the smallest node
id reachable from it) is unique — independent of iteration count,
partitioning, or execution order — so the result is reproducible and
oracle-checkable (DuckDB recursive-CTE transitive closure).

Scale shape per round: two groupBy(node) aggregations over the edge
list plus the equi-joins that re-point edges — all keyed shuffles,
no nested loops. Edge count never grows past |E|+|V| (large-star
emits exactly one edge per directed edge; small-star one per edge
plus one per node). The convergence probe is one anti-join
limit(1).count() per round — an O(rounds) driver-side scalar, not a
collect of data. Rounds are capped; exhausting the cap RAISES rather
than returning unconverged labels, because an unconverged result
silently splits true clusters.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u=bigger, v=smaller), no self
    loops, distinct."""
    return (
        e.select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Re-point every bigger neighbour at the neighbourhood minimum:
    for each node u, m = min(N(u) ∪ {u}); emit (v, m) for v in N(u),
    v > u.  Never emits a self loop (m <= u < v)."""
    nbrs = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (nbrs.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m")))
    return (nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(e: DataFrame, pre_oriented: bool = False) -> DataFrame:
    """Flatten local fan-in: orient each edge big→small; for each
    node u with smaller neighbours S(u), m = min(S(u)); emit (w, m)
    for w in S(u) ∪ {u} (self loops dropped by the caller's
    _canon).

    `pre_oriented=True` skips the input _canon when the caller
    guarantees u > v with no self loops (true of `_large_star` output:
    it emits (v, m) with m <= u < v). Duplicate input edges are then
    possible but harmless — the min aggregation is duplicate-
    insensitive and `leaves` duplicates collapse in the caller's outer
    _canon — so skipping the inner distinct drops one shuffle per
    round without changing the round's RESULT (pytest pins the loop's
    fixpoint)."""
    directed = e if pre_oriented else _canon(e)  # u > v for every row
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    leaves = (directed.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    centers = mins.select("u", F.col("m").alias("v"))
    return leaves.unionByName(centers)


def connected_components(edges: DataFrame, a_col: str = "a",
                         b_col: str = "b",
                         max_rounds: int = MAX_ROUNDS,
                         materialize_input: bool = True) -> DataFrame:
    """(node, comp) for every node in `edges`, comp = min reachable
    node id. Nodes appear even if their only edge is a self-loop;
    callers union isolated nodes afterwards if needed.

    `materialize_input=False` skips the input-edge checkpoint: for a
    caller whose edge plan is a trivial projection, one extra lazy
    evaluation is cheaper than an eager materialization job.
    """
    # Materialize the INPUT edge plan once before anything consumes
    # it: `nodes` and the canonical edge set below would otherwise
    # each re-execute the caller's pair-generation plan — for the
    # dedup pipelines that plan is the expensive posting-list /
    # verification subquery, so the duplicate evaluation used to
    # double the whole candidate stage (guide §5: cut lineage, reuse
    # the materialized intermediate).
    raw = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if materialize_input:
        raw = raw.localCheckpoint(eager=True)
    # localCheckpoint (not persist): an iterative self-join DOUBLES
    # the logical plan every round, and Catalyst re-analyzes the full
    # lineage at each action — by round ~10 the plan tree alone OOMs
    # the driver. Checkpointing cuts lineage so every round starts
    # from a flat scan of materialized blocks. (On a real cluster,
    # reliable checkpoint() to HDFS trades speed for executor-loss
    # tolerance; localCheckpoint is the right call for bounded loops.)
    # nodes stays LAZY off the checkpointed raw edges: it is consumed
    # exactly once (the final left join), so an eager checkpoint here
    # was one full job of pure overhead per closure
    nodes = (raw.select(F.col("u").alias("node"))
             .unionByName(raw.select(F.col("v").alias("node")))
             .distinct())
    e = _canon(raw).localCheckpoint(eager=True)
    e_count = e.count()
    converged = False
    for _ in range(max_rounds):
        new_e = _canon(_small_star(_large_star(e), pre_oriented=True)) \
            .localCheckpoint(eager=True)
        # set equality: both sides distinct, so equal counts plus an
        # empty one-sided difference proves the sets identical. The
        # anti-join probe only runs when the counts already agree
        # (unequal counts prove change without a second job), and the
        # previous round's count is remembered instead of recounted.
        new_count = new_e.count()
        changed = (new_count != e_count
                   or new_e.join(e, ["u", "v"], "left_anti")
                   .limit(1).count() > 0)
        e = new_e
        e_count = new_count
        if not changed:
            converged = True
            break
    if not converged:
        # returning unconverged labels would silently split true
        # clusters (multiple "keepers" inside one duplicate group) —
        # a correctness failure, not a perf knob. Note max_rounds
        # counts DETECTION rounds: the fixpoint needs its rounds plus
        # one final no-change round to prove itself. Labels that
        # stabilized exactly on the last round still raise —
        # correct-but-unproven is indistinguishable from wrong here.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_rounds} rounds (the final round must observe zero "
            f"changes); raise max_rounds")
    # at the fixpoint e is a star forest (u=member, v=component min);
    # the groupBy(min) is belt-and-braces, not load-bearing. The
    # result is graph-sized (dim-bounded): materialize it so callers
    # compose a flat scan, not the label-derivation subplan (same
    # lifecycle as every loop state above).
    labels = e.groupBy(F.col("u").alias("node")) \
        .agg(F.min("v").alias("comp"))
    return (nodes.join(labels, "node", "left")
            .select("node",
                    F.coalesce(F.col("comp"), F.col("node"))
                    .alias("comp"))
            .localCheckpoint(eager=True))


def dedup_decision_keep_best(docs: DataFrame, pairs: DataFrame,
                             quality_col: str = "q",
                             id_col: str = "doc_id",
                             pair_a: str = "id_a", pair_b: str = "id_b",
                             checkpoint_result: bool = True,
                             materialize_pairs: bool = True
                             ) -> DataFrame:
    """(id, component, q, is_keeper): transitive near-dup closure
    with a QUALITY keeper policy — each cluster's survivor is its
    highest-`quality_col` document (tie -> smallest id), not the
    smallest id. This is what production dedup actually wants: when
    a boilerplate-ridden mirror and the clean original collide, keep
    the clean one regardless of which crawled first.

    Scale shape: closure as in dedup_decision, then ONE
    component-keyed aggregation (argmax via min-of-struct — a single
    map-side-combinable agg, no per-cluster window sort) and one join
    back on the same component key. Cluster count <= doc count, so
    both stages shard uniformly; a pathological mega-cluster costs
    one hot aggregation key whose state is a single struct, not a
    sort of its members.

    Determinism: struct ordering on (-q, id) — q is IEEE-negated
    (exact) so min(struct) == (max q, then min id); q values are the
    engine's exactness-pinned quality scores, bit-identical to the
    oracle's, so keeper choice is reproducible cross-engine.
    """
    comp = connected_components(pairs, pair_a, pair_b,
                                materialize_input=materialize_pairs)
    labeled = (
        docs.select(F.col(id_col).alias("node"), F.col(quality_col))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("comp"), F.col("node")).alias("component"),
            F.col(quality_col))
    )
    # labeled feeds BOTH the keeper argmax and the final join, and its
    # quality column is typically an expensive per-doc score — persist
    # it for the build, materialize the small decision, release (the
    # charlm lifecycle; checkpoint_result=False keeps the live plan
    # for plan-shape budgeting at the cost of the double evaluation)
    if checkpoint_result:
        labeled = labeled.persist()
    # NULL quality is pinned to -inf (NULLS-LAST semantics): struct
    # min would otherwise sort a NULL nq FIRST and crown the NULL-q
    # doc, while a SQL `ORDER BY q DESC` twin defaults NULLS LAST —
    # the one corpus-dependent divergence in this operator. With the
    # coalesce, an all-NULL cluster falls back to min-id (nq ties at
    # +inf -> kid decides), matching `ORDER BY q DESC NULLS LAST, id`.
    nq = -F.coalesce(F.col(quality_col), F.lit(float("-inf")))
    best = labeled.groupBy("component").agg(
        F.min(F.struct(nq.alias("nq"),
                       F.col(id_col).alias("kid"))).alias("b"))
    out = (labeled.join(best, "component")
           .withColumn("is_keeper", F.col(id_col) == F.col("b.kid"))
           .drop("b"))
    if checkpoint_result:
        out = out.localCheckpoint(eager=True)
        labeled.unpersist(blocking=False)
    return out


def dedup_decision(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "id_a", pair_b: str = "id_b",
                   materialize_pairs: bool = True
                   ) -> DataFrame:
    """(id, component, is_keeper) for every document: transitive
    near-dup closure over `pairs`, keeper = smallest id per cluster;
    docs without any pair keep themselves (singleton component)."""
    comp = connected_components(pairs, pair_a, pair_b,
                                materialize_input=materialize_pairs)
    return (
        docs.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("comp"), F.col("node")).alias("component"))
        .withColumn("is_keeper", F.col("component") == F.col(id_col))
    )
