"""The round-3 stateless gates (PII scrub, Gopher quality, script
profile, hash sampling) are pure projections/filters, so they lift
into Structured Streaming unchanged — stream output must equal batch
output row-for-row. This pins that composition (a crawl ingest
pipeline scrubs and gates in the stream, not in a second batch
pass)."""
from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extractor_spark.functions.pii import pii_counts, pii_redact
from document_extractor_spark.functions.sampling import hash_sample
from document_extractor_spark.functions.textstats import (
    gopher_quality,
    script_profile,
)


def _gate(df: DataFrame) -> DataFrame:
    """The composed stateless ingest gate under test."""
    g = gopher_quality(F.col("text"))
    s = script_profile(F.col("text"))
    out = df.select(
        "doc_id",
        pii_redact(F.col("text")).alias("scrubbed"),
        pii_counts(F.col("text")).alias("pii"),
        g["passes"].alias("q_pass"),
        s["dominant"].alias("script"),
    )
    return hash_sample(out, "doc_id", rate=0.7)


@pytest.fixture()
def gate_input(spark, tmp_path):
    path = str(tmp_path / "docs")
    rows = []
    base = ("the quick brown fox jumps over a lazy dog and then keeps "
            "moving through very green fields forever onward ") * 4
    for i in range(60):
        text = base + f"doc {i}"
        if i % 4 == 0:
            text += f" contact user{i}@example.org"
        if i % 5 == 0:
            text += " Привет мир"
        rows.append((i, text))
    spark.createDataFrame(rows, "doc_id: long, text: string") \
        .repartition(4).write.parquet(path)
    return path


def test_stream_equals_batch(spark, tmp_path, gate_input):
    batch = sorted(
        map(tuple, _gate(spark.read.parquet(gate_input)).collect()))

    schema = spark.read.parquet(gate_input).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(gate_input)
    )
    out_dir = str(tmp_path / "out")
    q = (
        _gate(stream).writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # assert the drain actually finished: a False return means
    # timeout, and reading out_dir then would diff partial output
    assert q.awaitTermination(300)
    streamed = sorted(
        map(tuple, spark.read.parquet(out_dir).collect()))
    assert streamed == batch
    # the gate actually did something: pii scrubbed, sample applied
    assert 0 < len(streamed) < 60
    assert any("<EMAIL>" in r[1] for r in streamed)
