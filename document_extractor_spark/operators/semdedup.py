"""SemDeDup — semantic deduplication via embedding clusters (Abbas
et al. 2023, arXiv:2303.09540).

The published recipe: k-means-cluster document embeddings, then look
for near-duplicate pairs ONLY within each cluster (cosine above a
threshold), and keep one representative per connected duplicate
group. Clustering bounds the otherwise-quadratic pair search: the
paper scales #clusters with the corpus so cluster size stays roughly
constant, which is exactly the knob `k` exposes here.

Everything runs on the INTEGER lattice (the repo's exactness rule —
float distance sums flip argmins across engines by a ulp):

  embeddings  the in-engine feature-hashed vectors
              (functions/embed.py) — exact integer signed counts.
  k-means     centroids are QUANTIZED to integer vectors each
              iteration (truncating division toward zero, spelled
              sign-explicitly so Spark `div`, Python, and DuckDB
              `//` agree on negatives); distances are then exact
              BIGINT sums of squares and the argmin (tie -> lowest
              cluster id) is bit-stable on any engine/partitioning.
              Init = the vectors of the k smallest doc ids; an
              iteration that empties a cluster keeps its previous
              centroid.
  near-dups   within-cluster pairs with cos(x, y) > tau, decided by
              integer cross-multiplication:
                x.y > 0  AND  q^2 * (x.y)^2 > p^2 * |x|^2 * |y|^2
              for tau = p/q — no sqrt, no floats. Zero vectors
              (empty docs) never pair.
  decision    transitive closure via the star-contraction connected
              components + keeper = min doc id (operators/
              components.py) — the same decision shape every other
              dedup family in this engine ends in.

Scale shape: each k-means iteration is ONE map-side-combined
groupBy(cluster) of k*(dim+1) cells collected to the driver (the
dim-bounded plan-building-scalar allowance); assignments are
zero-shuffle projections — the centroids ride in the plan as
literals (at very large k, switch to a broadcast join). The pair
stage is an equi-join on cluster id, quadratic only WITHIN a
cluster: size your k so corpus/k stays bounded, as the paper does.
No stage sorts or shuffles anything wider than (doc, embedding).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import dedup_decision


def _trunc_div(s: int, n: int) -> int:
    """Truncating integer division toward zero (matches the
    sign-explicit SQL `CASE WHEN s < 0 THEN -((-s) // n) ELSE
    s // n END`; Python's // alone floors)."""
    return -((-s) // n) if s < 0 else s // n


def _dist2(emb_col: F.Column, centroid: list[int]) -> F.Column:
    """Exact squared euclidean distance |x - c|^2 as a BIGINT sum."""
    c = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(emb_col, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign_col(emb_col: F.Column, centroids: list[list[int]]) -> F.Column:
    """Argmin cluster id over literal centroids, tie -> lowest id
    (array_position finds the FIRST minimum). Built as a flat
    k-element distance array — a when-chain argmin nests each step's
    best inside the next (O(k^2) expression tree; the converter
    stack-overflows near k~20), while this stays O(k*dim).

    A NULL embedding (every distance NULL -> array_min NULL ->
    position NULL) coalesces to cluster 0 — the when-chain's
    behavior (NULL < best is false at every step), which the
    centroid-update collect depends on (int(None) would raise)."""
    darr = F.array(*[_dist2(emb_col, c) for c in centroids])
    return F.coalesce(
        (F.array_position(darr, F.array_min(darr)) - 1).cast("int"),
        F.lit(0))


def kmeans_assign(emb: DataFrame, k: int = 4, iters: int = 2,
                  key_col: str = "doc_id",
                  emb_col: str = "embedding") -> DataFrame:
    """`(key_col, cluster)` — deterministic integer-lattice k-means.

    `emb` must map each key to an `array<long>` vector (the
    `hashed_embeddings` shape). Fewer rows than `k` simply yields
    fewer clusters. `iters` counts ASSIGNMENT rounds: round 1 uses
    the init centroids (k smallest keys' vectors), each later round
    uses quantized means of the previous assignment.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    init_rows = (emb.orderBy(key_col).limit(k)
                 .select(emb_col).collect())
    centroids = [list(map(int, r[0])) for r in init_rows]
    if not centroids:
        spark = emb.sparkSession
        return spark.createDataFrame(
            [], f"{key_col} long, cluster int")
    assigned = None
    for it in range(iters):
        assigned = emb.select(
            key_col,
            F.col(emb_col).alias("_v"),
            _assign_col(F.col(emb_col), centroids).alias("cluster"))
        if it == iters - 1:
            break
        dim = len(centroids[0])
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("_n"),
            *[F.sum(F.element_at("_v", d + 1)).alias(f"_s{d}")
              for d in range(dim)])
        by_cluster = {int(r["cluster"]): r for r in sums.collect()}
        centroids = [
            [_trunc_div(int(by_cluster[j][f"_s{d}"]), int(by_cluster[j]["_n"]))
             for d in range(dim)]
            if j in by_cluster else centroids[j]  # empty cluster
            for j in range(len(centroids))
        ]
    return assigned.select(key_col, "cluster")


def semdedup(docs: DataFrame, key_col: str = "doc_id",
             text_col: str = "text", dim: int = 16, k: int = 4,
             iters: int = 2, tau: tuple[int, int] = (7, 10),
             checkpoint_result: bool = True) -> DataFrame:
    """`(key_col, cluster, component, is_keeper)` for every doc.

    `tau` is the cosine threshold as an exact rational (p, q) —
    default 7/10. A doc is dropped iff it is in a within-cluster
    near-dup component whose keeper (min id) is another doc.
    """
    from ..functions.embed import hashed_embeddings

    p, q = tau
    emb = hashed_embeddings(docs, key_col=key_col, text_col=text_col,
                            dim=dim)
    # the embedding table feeds the init collect, every iteration,
    # and the pair join legs — one persist, released once the small
    # decision is materialized (the charlm lifecycle)
    emb = emb.persist()
    clusters = kmeans_assign(emb, k=k, iters=iters, key_col=key_col,
                             emb_col="embedding")
    norm2 = F.aggregate(F.col("embedding"), F.lit(0).cast("long"),
                        lambda acc, x: acc + x * x)
    side = (emb.join(clusters, key_col)
            .select(F.col(key_col).alias("id"), "cluster",
                    F.col("embedding").alias("v"),
                    norm2.alias("n2")))
    a = side.select(F.col("id").alias("id_a"), "cluster",
                    F.col("v").alias("va"), F.col("n2").alias("na"))
    b = side.select(F.col("id").alias("id_b"), "cluster",
                    F.col("v").alias("vb"), F.col("n2").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_dot", dot)
        # cos > p/q on the integer lattice: positive dot AND
        # q^2 dot^2 > p^2 |x|^2 |y|^2 (decimal headroom for the
        # 4-factor product at large counts)
        .filter(
            (F.col("_dot") > 0)
            & (F.expr(f"cast(_dot as decimal(38,0)) * _dot * {q * q}")
               > F.expr(f"cast(na as decimal(38,0)) * nb * {p * p}")))
        .select("id_a", "id_b"))
    decision = dedup_decision(docs, pairs, id_col=key_col)
    out = (decision
           .join(clusters, key_col, "left")
           .select(key_col, "cluster", "component", "is_keeper"))
    if checkpoint_result:
        out = out.localCheckpoint(eager=True)
        emb.unpersist(blocking=False)
    else:
        # caller opted out of the checkpoint: the returned lineage
        # still references emb, so hand the release to a best-effort
        # hook rather than caching it forever (CLAUDE.md persist
        # lifecycle); recompute-on-eviction is correct, just slower
        emb.unpersist(blocking=False)
    return out


def cluster_balanced_sample(docs: DataFrame, cap: int,
                            key_col: str = "doc_id",
                            text_col: str = "text", dim: int = 16,
                            k: int | None = None,
                            iters: int = 2,
                            checkpoint_result: bool = True) -> DataFrame:
    """`(key_col, cluster, keep)` — topic-balanced selection: cap
    every embedding cluster at `cap` members (the cluster-capped
    sampling idea behind ClusterClip-style balanced corpora: a
    dominant topic cluster is trimmed to the quota instead of
    dominating the mix; repetition-prone clusters lose their tail).

    Within a cluster the kept members are chosen by the engine's
    deterministic md5 lattice — priority = 16-bit md5 prefix of the
    id's decimal string, tie -> smallest id — so the sample is
    reproducible and SQL-checkable, not RNG-dependent.

    `k=None` derives the cluster count from the corpus (constant
    ~125-doc clusters, same lockstep formula as the semdedup query).

    Scale shape: zero-shuffle embeddings + the dim-bounded k-means
    collect, then skew-safe two-phase per-cluster top-cap (no
    cluster-wide sort even for a degenerate giant cluster) and one
    id-keyed left join to flag the trimmed tail. No corpus sort, no
    quadratic stage.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from ..functions.embed import hashed_embeddings
    from .topk import skew_safe_topk

    emb = hashed_embeddings(docs, key_col=key_col, text_col=text_col,
                            dim=dim).persist()
    if k is None:
        k = max(4, emb.count() // 125)
    clusters = kmeans_assign(emb, k=k, iters=iters, key_col=key_col)
    # 16-bit md5 prefix of the DECIMAL string form (cross-engine:
    # DuckDB md5(CAST(id AS VARCHAR)); conv returns string -> cast)
    pri = clusters.withColumn(
        "_h",
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4),
               16, 10).cast("long"))
    kept = skew_safe_topk(
        pri, ["cluster"], [F.col("_h").asc(), F.col(key_col).asc()],
        cap, bucket_col=key_col, rank_name="_rk")
    out = (clusters.join(
        kept.select(F.col(key_col).alias("_kid")).withColumn(
            "_keep", F.lit(True)),
        clusters[key_col] == F.col("_kid"), "left")
        .select(key_col, "cluster",
                F.coalesce(F.col("_keep"), F.lit(False)).alias("keep")))
    if checkpoint_result:
        out = out.localCheckpoint(eager=True)
    # checkpoint_result=False keeps the LIVE plan (for plan-shape
    # budgeting); the returned lineage still reads the persisted emb,
    # released best-effort here (recompute-on-eviction is correct)
    emb.unpersist(blocking=False)
    return out
