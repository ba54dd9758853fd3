"""In-engine document embeddings via the hashing trick.

The similarity/near-dup stack (operators/similarity.py, dedup.py)
consumes an `embedding array<float>` column; this module supplies
the ENCODE step without any external model artifact: the classic
feature-hashing projection (Weinberger et al., "Feature Hashing for
Large Scale Multitask Learning") — every token contributes ±1 to
each of `dim` components, with the sign taken from one md5 of the
token (bit d of the first 16 hex chars decides dim d), so a
document's raw embedding is a vector of INTEGER signed counts:

    e_d(doc) = sum over token occurrences of sign_d(token)

Integer sums are exact and order-independent — the same property
every value-checked oracle in this repo leans on — so the raw
vectors cross-check bit-for-bit against a SQL twin; unit
normalization (for cosine consumers) is a trivial float epilogue the
caller applies (`normalized=True`).

Scale shape: ONE md5 per token occurrence (the 64 sign bits all come
from that single hash), 64 conditional sums in one map-side-combined
doc groupBy — no shuffle beyond it, no Python anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col


def _sign_expr(dim: int) -> str:
    """±1 sign for dimension `dim` from the token md5 (SQL fragment
    over a column named `_h` holding md5(token)). Bit d of hex digit
    d//4 — identical arithmetic in the DuckDB twin."""
    return (f"(2 * ((cast(conv(substring(_h, {1 + dim // 4}, 1), 16, 10)"
            f" as int) div {1 << (dim % 4)}) % 2) - 1)")


def hashed_embeddings(docs: DataFrame, key_col: str = "doc_id",
                      text_col: str = "text", dim: int = 64,
                      normalized: bool = False) -> DataFrame:
    """`(key_col, embedding)` — feature-hashed doc vectors.

    `normalized=False` (default): `array<long>` of exact signed
    counts (the oracle-checkable form). `normalized=True`:
    `array<double>` unit vectors ready for the cosine/ANN operators
    (all-zero vectors stay all-zero).

    `key_col` must be UNIQUE per row (it is a document primary key
    everywhere in this engine): the dim<=60 fast path is a per-row
    projection, while the dim>60 legacy path groupBy-merges rows
    sharing a key — duplicate keys would get per-fragment vectors on
    one path and a summed vector on the other.
    """
    if not 1 <= dim <= 64:
        raise ValueError("dim must be in 1..64 (one md5 per token)")
    if dim <= 60:
        # zero-shuffle path: ONE conv of the md5's first
        # ceil(dim/4) hex chars packs every needed sign bit into a
        # single BIGINT per token (<=60 bits — signed-long safe), so
        # the embedding is a handful of in-array integer folds over a
        # per-doc column — no token explode, no doc groupBy, no
        # exchange. Bit d of hex digit q=d//4 is bit 4*(L-1-q)+(d%4)
        # of the packed value: identical ints to the per-digit conv
        # the docstring's oracle twin spells out.
        #
        # r6: ONE fold per NIBBLE instead of one per dim — the folds
        # are interpreted (higher-order functions never codegen,
        # CLAUDE.md), so fold count is the cost driver. A nibble's 4
        # sign bits spread into four 16-bit counter fields of one
        # accumulator via multiply-and-mask ((x*M)&MASK puts bit j of
        # x at position 16j; fields can't collide for x<16), so
        # ceil(dim/4) folds of ~4 integer ops replace `dim` folds.
        # e_d = 2*count_d - n_tokens recovers the exact signed sum.
        # Counter fields hold counts < 2^16 and the top field ends at
        # bit 62, so the fast path is guarded to < 32768 tokens; the
        # (vanishingly rare) longer docs take the legacy per-dim fold
        # in the same projection — identical integers either way
        # (pytest pins the equality across the boundary).
        n_hex = (dim + 3) // 4
        toks = F.coalesce(tokens_col(text_col),
                          F.array().cast("array<string>"))
        packed = F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 1, n_hex), 16, 10)
            .cast("long"))
        spread_m = 1 + (1 << 15) + (1 << 30) + (1 << 45)
        spread_mask = 0x0001000100010001
        token_lim = 32768

        def _acc(q: int) -> F.Column:
            return F.aggregate(
                F.col("_tv"), F.lit(0).cast("long"),
                lambda acc, v: acc + (
                    F.shiftright(v, 4 * q).bitwiseAND(F.lit(15))
                    * F.lit(spread_m)).bitwiseAND(F.lit(spread_mask)))

        def _e_legacy(d: int) -> F.Column:
            shift = 4 * (n_hex - 1 - d // 4) + (d % 4)
            return F.aggregate(
                F.col("_tv"), F.lit(0).cast("long"),
                lambda acc, v: acc + (
                    F.shiftright(v, shift).bitwiseAND(F.lit(1))
                    * F.lit(2) - F.lit(1)))

        def _e(d: int) -> F.Column:
            q = n_hex - 1 - d // 4
            cnt = F.shiftright(F.col(f"_a{q}"),
                               16 * (d % 4)).bitwiseAND(F.lit(0xFFFF))
            return F.when(F.col("_n") < token_lim,
                          cnt * 2 - F.col("_n")).otherwise(_e_legacy(d))

        # staged projections: _tv is referenced by every fold and _n,
        # and each _aq by up to 4 dims — separate selects keep
        # CollapseProject from re-inlining the md5 transform (or a
        # fold) once per consumer
        sums = (docs.select(key_col, packed.alias("_tv"))
                .select(key_col, "_tv",
                        F.size("_tv").cast("long").alias("_n"))
                .select(key_col, "_tv", "_n",
                        *[F.when(F.col("_n") < token_lim, _acc(q))
                          .alias(f"_a{q}") for q in range(n_hex)])
                .select(key_col,
                        *[_e(d).alias(f"_e{d}") for d in range(dim)]))
    else:
        toks = docs.select(
            key_col,
            F.explode_outer(tokens_col(text_col)).alias("_tok"),
        ).withColumn("_h", F.md5(F.col("_tok")))
        sums = toks.groupBy(key_col).agg(*[
            F.sum(F.when(F.col("_tok").isNotNull(),
                         F.expr(_sign_expr(d))).otherwise(0))
            .cast("long").alias(f"_e{d}")
            for d in range(dim)
        ])
    emb = F.array(*[F.col(f"_e{d}") for d in range(dim)])
    if not normalized:
        return sums.select(key_col, emb.alias("embedding"))
    # Two projections (the _with_unit_vec pattern from
    # operators/similarity.py): the O(dim) norm must be a materialized
    # per-row column BEFORE the per-element divide — a lambda-captured
    # norm expression gets re-inlined by Catalyst once per element,
    # turning the epilogue into O(dim^2) expression evals per row.
    raw = sums.select(key_col, emb.alias("_raw"))
    withn = raw.withColumn("_nrm", F.sqrt(F.aggregate(
        F.col("_raw"), F.lit(0.0), lambda a, x: a + (x * x).cast("double"))))
    unit = F.when(F.col("_nrm") > 0, F.transform(
        F.col("_raw"), lambda x: x.cast("double") / F.col("_nrm"))).otherwise(
        F.transform(F.col("_raw"), lambda x: x.cast("double")))
    return withn.select(key_col, unit.alias("embedding"))
