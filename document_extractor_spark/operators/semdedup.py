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

# Above this k the literal-centroid expression argmin is replaced by
# an Arrow-batched numpy kernel (bit-identical; see _assign_arrow):
# the expression form costs O(k*dim) interpreted expression nodes PER
# ROW (ADVICE r5: at corpus-scaled k the assignment is O(n^2/125)
# interpreted work and the plan itself grows with the corpus), while
# the kernel is two BLAS matmuls per batch with an O(1) plan. Below
# the bound the expression path keeps the plan Python-free.
_KERNEL_MIN_K = 32


def _f64_exact_bound(dim: int) -> int:
    """Max |value| for which the kernel's float64 arithmetic is EXACT:
    every intermediate is an integer of magnitude <= 4*dim*maxv^2
    (distance terms |x|^2, 2*x.c, |c|^2 and their sums), and float64
    represents integers exactly up to 2^53 — so require
    4*dim*maxv^2 <= 2^53. Values past the bound take the int64 path."""
    import math

    return math.isqrt((1 << 53) // (4 * dim))


def _trunc_div(s: int, n: int) -> int:
    """Truncating integer division toward zero (matches the
    sign-explicit SQL `CASE WHEN s < 0 THEN -((-s) // n) ELSE
    s // n END`; Python's // alone floors)."""
    return -((-s) // n) if s < 0 else s // n


def _flat_sum(terms: list[F.Column]) -> F.Column:
    """Left-assoc sum of dim-bounded int64 terms (exact in any
    grouping; spelled left-to-right to mirror the fold it replaces)."""
    out = terms[0].cast("long")
    for t in terms[1:]:
        out = out + t
    return out


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


def _batch_vectors(batch, dim: int):
    """(X int64 ndarray n x dim, null_mask) from an Arrow record
    batch's second column (`array<long>` embeddings). Row-level NULL
    vectors are masked (assigned cluster 0, excluded from centroid
    sums — the expression path's coalesce/NULL-sum semantics).
    Element-level NULLs inside a non-NULL vector have no analog in
    any producer in this engine and raise loudly rather than diverge
    silently from the expression path's NULL-propagation quirks."""
    import numpy as np

    col = batch.column(1)
    n = len(col)
    null_mask = np.zeros(n, dtype=bool)
    if col.null_count:
        null_mask = col.is_null().to_numpy(zero_copy_only=False)
    flat = col.flatten()
    if flat.null_count:
        raise ValueError(
            "kmeans kernel: NULL element inside an embedding vector")
    lengths = col.value_lengths().to_numpy(zero_copy_only=False)
    if not ((lengths == dim) | null_mask).all():
        raise ValueError("kmeans kernel: ragged embedding vectors")
    vals = flat.to_numpy(zero_copy_only=False).astype(np.int64)
    X = np.zeros((n, dim), dtype=np.int64)
    X[~null_mask] = vals.reshape(-1, dim)
    return X, null_mask


def _argmin_clusters(X, null_mask, C, cn2):
    """First-min argmin cluster ids, exactly as `_assign_col`: integer
    distances, tie -> lowest cluster id, NULL vector -> 0. float64
    matmul when every value is exact-representable, int64 otherwise."""
    import numpy as np

    bound = _f64_exact_bound(C.shape[1])
    if (np.abs(X).max(initial=0) <= bound
            and np.abs(C).max(initial=0) <= bound):
        # exact: integer products < 2^50, integer-valued sums < 2^53
        xc = X.astype(np.float64) @ C.T.astype(np.float64)
        x2 = (X.astype(np.float64) ** 2).sum(axis=1)
        d2 = x2[:, None] - 2.0 * xc + cn2.astype(np.float64)[None, :]
    else:
        xc = X @ C.T
        x2 = (X * X).sum(axis=1)
        d2 = x2[:, None] - 2 * xc + cn2[None, :]
    cl = np.argmin(d2, axis=1).astype(np.int32)  # first min = low id
    cl[null_mask] = 0
    return cl


def _assign_arrow(emb: DataFrame, centroids: list[list[int]],
                  key_col: str, emb_col: str) -> DataFrame:
    """(key_col, cluster) via one Arrow-batched numpy kernel —
    bit-identical to the `_assign_col` expression path (differential
    pytest + the sf0.1 oracle run pin it) with an O(1) plan."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.int64)
    cn2 = (C * C).sum(axis=1)
    dim = C.shape[1]

    def kernel(batches):
        import pyarrow as pa
        for batch in batches:
            X, null_mask = _batch_vectors(batch, dim)
            cl = _argmin_clusters(X, null_mask, C, cn2)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(cl, pa.int32())],
                [key_col, "cluster"])

    return emb.select(key_col, emb_col).mapInArrow(
        kernel, schema=f"{key_col} long, cluster int")


def _centroid_partials(emb: DataFrame, centroids: list[list[int]],
                       key_col: str, emb_col: str) -> DataFrame:
    """Per-batch (cluster, _n, _s0.._s{dim-1}) partial sums for the
    centroid update, computed inside the same Arrow kernel as the
    assignment so no per-doc row ever crosses the Python boundary
    twice. Bincount weights are integer-valued float64 (< 2^53 for
    any real corpus) -> exact."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.int64)
    cn2 = (C * C).sum(axis=1)
    k, dim = C.shape

    def kernel(batches):
        import pyarrow as pa
        for batch in batches:
            X, null_mask = _batch_vectors(batch, dim)
            cl = _argmin_clusters(X, null_mask, C, cn2)
            counts = np.bincount(cl, minlength=k).astype(np.int64)
            sums = np.empty((dim, k), dtype=np.int64)
            live = ~null_mask  # NULL rows count toward _n only
            for d in range(dim):
                sums[d] = np.bincount(
                    cl[live], weights=X[live, d].astype(np.float64),
                    minlength=k).astype(np.int64)
            arrays = [pa.array(np.arange(k, dtype=np.int32)),
                      pa.array(counts)]
            arrays += [pa.array(sums[d]) for d in range(dim)]
            yield pa.RecordBatch.from_arrays(
                arrays, ["cluster", "_n"]
                + [f"_s{d}" for d in range(dim)])

    schema = ("cluster int, _n long, "
              + ", ".join(f"_s{d} long" for d in range(dim)))
    return emb.select(key_col, emb_col).mapInArrow(kernel, schema=schema)


def _cluster_decision_arrow(side: DataFrame, p: int, q: int,
                            dim: int) -> DataFrame:
    """Per-cluster near-dup DECISION `(cluster, id, component)` — the
    Arrow/BLAS twin of the expression pair join + distributed
    transitive closure, bit-identical by construction.

    Pair test: integer dot products (float64 matmul under
    `_f64_exact_bound`, int64 past it) and the SAME exact integer
    predicate `dot > 0 AND q^2*dot^2 > p^2*|x|^2*|y|^2`, evaluated in
    int64 when the magnitude bound proves it overflow-free and with
    Python bigints otherwise.

    Closure: semdedup's pairs are CLUSTER-CONFINED by construction
    (the join was keyed on cluster), so the global closure equals the
    per-cluster closure — computed here as vectorized min-label
    propagation with pointer jumping over the in-group pair arrays.
    Rows are sorted by id first so index order == id order and the
    propagated minimum INDEX is the minimum reachable ID — the exact
    fixpoint `connected_components` produces. The pair stream never
    leaves the Python worker.

    Why: the a.join(b, "cluster") form explodes a hot cluster's pairs
    inside ONE sort-merge-join task (AQE's skew split keys on input
    BYTES and never fires on output-skew), every candidate pair pays
    row-decode plus decimal(38) multiplies, and the closure then pays
    ~5 shuffle stages x O(log n) rounds over the pair graph. Here a
    cluster's whole pair-search-plus-closure is one numpy gram
    computation per group (guide §4.2).

    `side` must be `(cluster int, id long, v array<long>)` with
    non-NULL fixed-`dim` vectors (semdedup's embeddings are total)."""
    import numpy as np
    import pandas as pd

    qq, pp = q * q, p * p
    int63 = (1 << 63) - 1

    def kern(pdf):
        ids = pdf["id"].to_numpy(dtype=np.int64)
        m = len(ids)
        clusters = pdf["cluster"].to_numpy(dtype=np.int32)
        if m == 0:
            return pd.DataFrame({
                "cluster": pd.Series([], dtype="int32"),
                "id": pd.Series([], dtype="int64"),
                "component": pd.Series([], dtype="int64")})
        order = np.argsort(ids, kind="stable")  # index order == id order
        ids = ids[order]
        clusters = clusters[order]
        if m == 1:
            return pd.DataFrame(
                {"cluster": clusters, "id": ids, "component": ids})
        X = np.stack(pdf["v"].to_numpy()[order]).astype(np.int64)
        maxv = int(np.abs(X).max(initial=0))
        exact_f64 = maxv <= _f64_exact_bound(dim)
        Xc = X.astype(np.float64) if exact_f64 else X
        n2 = np.einsum("ij,ij->i", Xc, Xc)
        n2 = n2.astype(np.int64) if exact_f64 else n2
        # overflow-free int64 predicate iff the dot/norm bound B keeps
        # q^2*B^2 and p^2*B^2 inside int64
        bound = dim * maxv * maxv
        int64_ok = max(qq, pp) * bound * bound <= int63
        col = np.arange(m)
        pr, pc = [], []
        blk = 1024  # bound gram-block memory to ~blk*m cells
        for s in range(0, m, blk):
            e = min(s + blk, m)
            G = Xc[s:e] @ Xc.T  # exact integer dots
            Gi = G.astype(np.int64) if exact_f64 else G
            # strict upper triangle in POSITION == id order
            upper = col[None, :] > np.arange(s, e)[:, None]
            if int64_ok:
                hit = upper & (Gi > 0) & (
                    qq * Gi * Gi > pp * (n2[s:e, None] * n2[None, :]))
            else:
                hit = np.zeros_like(upper)
                for r, c in np.argwhere(upper & (Gi > 0)):
                    d = int(Gi[r, c])
                    if qq * d * d > pp * int(n2[s + r]) * int(n2[c]):
                        hit[r, c] = True
            r_idx, c_idx = np.nonzero(hit)
            if len(r_idx):
                pr.append(r_idx.astype(np.int64) + s)
                pc.append(c_idx.astype(np.int64))
        lab = np.arange(m, dtype=np.int64)
        if pr:
            r = np.concatenate(pr)
            c = np.concatenate(pc)
            # min-label propagation + pointer jumping; the unique
            # fixpoint (min reachable index) is what the distributed
            # closure computes, independent of iteration order
            while True:
                prev = lab.copy()
                np.minimum.at(lab, r, lab[c])
                np.minimum.at(lab, c, lab[r])
                lab = lab[lab]  # pointer jump
                if np.array_equal(lab, prev):
                    break
        return pd.DataFrame(
            {"cluster": clusters, "id": ids, "component": ids[lab]})

    return side.groupBy("cluster").applyInPandas(
        lambda _key, pdf: kern(pdf),
        schema="cluster int, id long, component long")


def kmeans_assign(emb: DataFrame, k: int = 4, iters: int = 2,
                  key_col: str = "doc_id",
                  emb_col: str = "embedding") -> DataFrame:
    """`(key_col, cluster)` — deterministic integer-lattice k-means.

    `emb` must map each key to an `array<long>` vector (the
    `hashed_embeddings` shape). Fewer rows than `k` simply yields
    fewer clusters. `iters` counts ASSIGNMENT rounds: round 1 uses
    the init centroids (k smallest keys' vectors), each later round
    uses quantized means of the previous assignment.

    Above `_KERNEL_MIN_K` the per-row argmin runs as an Arrow numpy
    kernel instead of k literal-centroid expressions: same integers,
    same first-min tie-break (differential pytest), but the plan stays
    O(1) and the per-row cost is a BLAS matmul — the ADVICE-r5 fix for
    corpus-scaled k (no k-element literal array in the plan, no
    O(n*k*dim) interpreted expression evaluation).
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
    use_kernel = k >= _KERNEL_MIN_K
    dim = len(centroids[0])
    for it in range(iters - 1):
        if use_kernel:
            sums = _centroid_partials(
                emb, centroids, key_col, emb_col).groupBy("cluster").agg(
                F.sum("_n").alias("_n"),
                *[F.sum(f"_s{d}").alias(f"_s{d}") for d in range(dim)])
            sums = sums.filter(F.col("_n") > 0)
        else:
            assigned_it = emb.select(
                key_col,
                F.col(emb_col).alias("_v"),
                _assign_col(F.col(emb_col), centroids).alias("cluster"))
            sums = assigned_it.groupBy("cluster").agg(
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
    if use_kernel:
        return _assign_arrow(emb, centroids, key_col, emb_col)
    return emb.select(
        key_col,
        _assign_col(F.col(emb_col), centroids).alias("cluster"))


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
    if k >= _KERNEL_MIN_K:
        # Arrow decision kernel (bit-identical; see
        # _cluster_decision_arrow): a hot cluster's quadratic pair
        # search AND its transitive closure run as one numpy gram
        # computation per group — semdedup's pairs are cluster-
        # confined, so the per-cluster closure IS the global closure,
        # and the distributed star-contraction rounds are skipped
        # entirely on this path
        side_k = emb.join(clusters, key_col).select(
            "cluster", F.col(key_col).alias("id"),
            F.col("embedding").alias("v"))
        comp = _cluster_decision_arrow(side_k, p, q, dim)
        out = comp.select(
            F.col("id").alias(key_col), "cluster", "component",
            (F.col("component") == F.col("id")).alias("is_keeper"))
        if checkpoint_result:
            out = out.localCheckpoint(eager=True)
        emb.unpersist(blocking=False)
        return out
    else:
        # flat element_at sums, not aggregate/zip_with lambdas:
        # higher-order functions are interpreted (CLAUDE.md r5
        # convention) while the flat dim-bounded sum is whole-stage-
        # codegen'd — identical int64 values in the identical order
        norm2 = _flat_sum(
            [F.element_at("embedding", d + 1)
             * F.element_at("embedding", d + 1) for d in range(dim)])
        side = (emb.join(clusters, key_col)
                .select(F.col(key_col).alias("id"), "cluster",
                        F.col("embedding").alias("v"),
                        norm2.alias("n2")))
        a = side.select(F.col("id").alias("id_a"), "cluster",
                        F.col("v").alias("va"), F.col("n2").alias("na"))
        b = side.select(F.col("id").alias("id_b"), "cluster",
                        F.col("v").alias("vb"), F.col("n2").alias("nb"))
        dot = _flat_sum(
            [F.element_at("va", d + 1) * F.element_at("vb", d + 1)
             for d in range(dim)])
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
