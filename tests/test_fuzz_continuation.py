"""Seeded cross-engine fuzz for the continuation operators.

The driver checks ONE fixed corpus per query; this sweeps seeded
adversarial corpora (short docs, repeats, NULLs, empty strings,
single chars) through BOTH engines for the continuation's
value-checked queries, running the exact oracle SQL the driver runs.
Floats are canonicalized to 9 significant digits (the driver's own
comparison), integers compared exactly.
"""
from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em

QUERIES = [
    "nb_quality_classifier",
    "temperature_mix_sample",
    "jsonl_shard_plan",
    "charlm_cross_entropy",
    "heavy_hitters",
    "warc_ingest",
    "corpus_overview",
    "dom_blocks",
    "hashed_embeddings",
    # round-4 additions over the documents table
    "minhash_dedup_pipeline",
    "unicode_nfc",
    "ccnet_buckets",
    "eval_holdout",
    "c4_filters",
]


def _canon(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return "NULL" if v is None else str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("seed", [3, 11, 404, 9001, 20260817])
def test_fuzz_cross_engine_parity(spark, seed, tmp_path):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "Z", "x", "tok9", "the", "why"]
    rows = []
    for i in range(40):
        r = rng.random()
        if r < 0.08:
            text = None
        elif r < 0.16:
            text = ""
        elif r < 0.24:
            text = rng.choice("abcxyz")  # single char: no bigrams
        else:
            n = rng.randrange(1, 50)
            text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((i, text, f"src{i % 4}", "en", len(text or "")))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "source", "lang", "n_chars"])
    sdir = str(tmp_path / "sf")
    sdf = spark.createDataFrame(
        pdf, "doc_id: long, text: string, source: string, "
             "lang: string, n_chars: long")
    sdf.write.mode("overwrite").parquet(f"{sdir}/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)
    qfns, oracles = em.queries(), em.oracle_sql()
    try:
        for q in QUERIES:
            sdf_out = qfns[q](spark, sdir)
            got = _normalize([tuple(r) for r in sdf_out.collect()],
                             sdf_out.columns)
            rel = con.sql(oracles[q])
            want = _normalize(rel.fetchall(), rel.columns)
            assert got == want, (q, seed)
    finally:
        con.close()
