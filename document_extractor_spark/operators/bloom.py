"""Bloom-filter membership dedup (Bloom 1970; double hashing per
Kirsch & Mitzenmacher 2006; the document/paragraph-level dedup design
follows Dolma's deduper, Soldaini et al. 2024, arXiv:2402.00159 §3).

A Bloom filter over the *seen* corpus answers "was this content ever
ingested?" in O(k) probes against an m-bit array — the compact
pre-filter a recurring crawl runs before (or instead of) the exact
anti-join (`q_incremental_dedup`). False positives are an explicit,
deterministic property of (m, k, hash fn): with the hash positions
pinned to md5 slices, the SAME documents collide in every engine, so
the DuckDB oracle reproduces the filter decision bit for bit.

Representation: the filter is a WORD TABLE `(w, bits)` — word index
`w = position >> 6`, `bits` = OR of `1 << (position & 63)` over every
seen position landing in that word. It has at most `min(k*|seen|,
m/64)` rows (m=2**20 -> 16k rows) and is broadcast to the probe side;
membership is a broadcast join + bit test, all JVM expressions (zero
Python stages, zero driver collect).

Scale shape (10^12 docs): a single broadcastable bloom saturates
around m≈2^33 bits (~2^27 words). Beyond that the deployment story is
the standard one: shard the key space (`pmod(hash, S)`) and build S
independent word tables, or use the bloom only as the cheap high-FP
pre-filter in front of the exact `left_anti` join — the same role
AQE's runtime row-group bloom plays. Both sides of that trade are
documented here rather than hidden: the operator takes `m_bits` and
the caller owns the FP-rate budget ((1-e^{-kn/m})^k).

Hash positions (both engines, bit-identical):
    h1  = first 8 md5 hex chars as a 32-bit integer
    h2  = next 8 hex chars as a 32-bit integer, forced odd (2*x+1)
    pos_i = (h1 + i*h2) mod m          for i in 0..k-1
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4


def _check_params(m_bits: int, k: int) -> None:
    if m_bits < 64:
        raise ValueError("m_bits must be >= 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in 1..16")


def bloom_positions(col: Column, m_bits: int = DEFAULT_M_BITS,
                    k: int = DEFAULT_K) -> Column:
    """`array<long>` of the k bloom bit positions for a string column
    (double hashing over two md5 32-bit slices; see module docstring).
    NULL input hashes like the empty string (coalesced) so membership
    is total."""
    _check_params(m_bits, k)
    h = F.md5(F.coalesce(col, F.lit("")))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") * 2 + 1
    return F.array(*[
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)
    ])


def bloom_word_table(seen: DataFrame, col: str = "text",
                     m_bits: int = DEFAULT_M_BITS,
                     k: int = DEFAULT_K) -> DataFrame:
    """Build the `(w, bits)` word table over `seen[col]` — the
    persistable bloom artifact (<= min(k*|seen|, m_bits/64) rows; a
    recurring pipeline writes this once per snapshot and unions new
    words in, exactly like the seen-band table in incremental
    MinHash)."""
    pos = seen.select(
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("p"))
    words = (
        pos.select(F.shiftright(F.col("p"), 6).alias("w"),
                   F.pmod(F.col("p"), 64).cast("int").alias("b"))
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
             .alias("bits"))
    )
    # Materialize eagerly: the k probe joins each reference the word
    # table under different aliases, which defeats broadcast-exchange
    # reuse — without this the seen-side scan+groupBy would execute k
    # times. The artifact is <= m/64 rows; in production it IS the
    # persisted parquet snapshot (see module docstring), and a
    # checkpoint is the in-session equivalent.
    return words.localCheckpoint(eager=True)


def with_bloom_flag(batch: DataFrame, words: DataFrame,
                    col: str = "text",
                    m_bits: int = DEFAULT_M_BITS,
                    k: int = DEFAULT_K,
                    flag_col: str = "bloom_hit") -> DataFrame:
    """`batch` + an int `flag_col`: 1 iff ALL k bit positions of
    `batch[col]` are set in the word table (bloom "seen" — exact
    membership or a deterministic false positive).

    ZERO probe-side shuffles: each of the k probes is a broadcast
    left join against the word table (identical broadcast subplans —
    Spark reuses one exchange), and the AND folds with `least`. At
    100 TB the corpus stays exactly where it is; only the <=
    m/64-row word table moves."""
    _check_params(m_bits, k)
    pos = bloom_positions(F.col(col), m_bits, k)
    out = batch.withColumn("_bp", pos)
    presents = []
    for i in range(k):
        wt = words.select(F.col("w").alias(f"_w{i}"),
                          F.col("bits").alias(f"_bits{i}"))
        out = (
            out.withColumn(f"_w{i}",
                           F.shiftright(F.col("_bp")[i], 6))
            .withColumn(f"_b{i}",
                        F.pmod(F.col("_bp")[i], 64).cast("int"))
            .join(F.broadcast(wt), on=f"_w{i}", how="left")
        )
        presents.append(F.when(
            F.col(f"_bits{i}").isNull(), F.lit(0)
        ).otherwise(F.expr(
            f"CAST(shiftright(_bits{i}, _b{i}) & 1 AS INT)")))
    # F.least needs >= 2 columns; k=1 (allowed by _check_params) is
    # just the single probe
    out = out.withColumn(
        flag_col, presents[0] if k == 1 else F.least(*presents))
    drop = ["_bp"] + [c for i in range(k)
                      for c in (f"_w{i}", f"_b{i}", f"_bits{i}")]
    return out.drop(*drop)


def bloom_membership(batch: DataFrame, words: DataFrame,
                     col: str = "text", id_col: str = "doc_id",
                     m_bits: int = DEFAULT_M_BITS,
                     k: int = DEFAULT_K,
                     flag_col: str = "bloom_hit") -> DataFrame:
    """`(id_col, flag_col)` per batch row (see `with_bloom_flag` for
    the zero-shuffle probe plan)."""
    return with_bloom_flag(batch, words, col, m_bits, k,
                           flag_col).select(id_col, flag_col)


def bloom_seen_filter(docs: DataFrame, seen: DataFrame,
                      col: str = "text", id_col: str = "doc_id",
                      m_bits: int = DEFAULT_M_BITS,
                      k: int = DEFAULT_K) -> DataFrame:
    """End-to-end: build the bloom over `seen[col]`, probe every doc
    in `docs`; returns `(id_col, bloom_hit)`. Callers drop hit=1 rows
    (accepting the FP rate) or route them to the exact anti-join."""
    words = bloom_word_table(seen, col, m_bits, k)
    return bloom_membership(docs, words, col, id_col, m_bits, k)


def paragraph_dup_stats(docs: DataFrame, seen: DataFrame,
                        col: str = "text", id_col: str = "doc_id",
                        m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K) -> DataFrame:
    """Dolma-style paragraph-level dedup signal: per batch doc, how
    many of its non-empty lines ('\\n'-separated, exact — no trim)
    are in the bloom built over the seen corpus's lines. Returns
    `(id_col, n_paras, n_dup_paras)`; docs with no non-empty line
    report (0, 0).

    Plan: both sides explode lines once; the seen side collapses to
    the word table (broadcastable), the batch side takes the
    zero-shuffle `with_bloom_flag` probe per line (empty lines kept
    as valid=0 markers so every doc survives to the final
    groupBy(doc) — the ONLY corpus-side exchange; no distinct, no
    self-join)."""
    _check_params(m_bits, k)
    split = F.split(F.coalesce(F.col(col), F.lit("")), "\n", -1)

    seen_lines = (
        seen.select(F.explode(split).alias("para"))
        .filter(F.col("para") != ""))
    words = bloom_word_table(seen_lines, "para", m_bits, k)

    # split('') == [''], so every doc emits >= 1 line row; '' rows
    # carry valid=0 and are excluded from both counts (their bloom
    # positions are computed but ignored).
    lines = docs.select(F.col(id_col), F.explode(split).alias("para"))
    flagged = with_bloom_flag(lines, words, col="para", m_bits=m_bits,
                              k=k)
    valid = (F.col("para") != "").cast("long")
    return (
        flagged.groupBy(id_col)
        .agg(F.sum(valid).alias("n_paras"),
             F.sum(valid * F.col("bloom_hit")).cast("long")
             .alias("n_dup_paras"))
    )
