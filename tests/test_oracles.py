"""Contract guard: a sample of queries() must match their DuckDB
oracle_sql() twins at sf0.001 — the same comparison the driver runs
at sf0.01 (full sweep: scripts/oracle_check.py)."""
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
SAMPLE = [
    "extract_html_roundtrip",
    "pricing_summary",
    "median_gate",
    "chunk_pack_cumsum",
    "resume_anti_join",
    "minhash_signatures",
    "langid",
    "ann_cosine_topk",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present")


def _canon(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return "NULL" if v is None else str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_pair(spark, con, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(entrymod.oracle_sql()[name])
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(orows)
    assert _normalize(srows, sdf.columns) == _normalize(orows, rel.columns)
