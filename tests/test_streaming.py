"""Streaming watcher tests: AvailableNow drain, exactly-once via
checkpoint, late-arriving files picked up by the next cycle
(the Spark twin of entrypoint.sh:92-158)."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_pages(corpus, sl, path):
    sub = corpus.pages.iloc[sl]
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(sub, schema=schema, preserve_index=False), path)


@pytest.fixture()
def stream_dirs(tmp_path, corpus):
    ind = tmp_path / "in"
    ind.mkdir()
    _write_pages(corpus, slice(0, 40), str(ind / "batch0.parquet"))
    return {
        "in": str(ind),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_watcher_drains_and_is_exactly_once(spark, corpus, cfg, stream_dirs):
    from document_extractor_spark.streaming import run_watcher_once

    q = run_watcher_once(spark, stream_dirs["in"], stream_dirs["out"],
                         stream_dirs["ckpt"], cfg)
    q.awaitTermination(120)
    n1 = spark.read.parquet(stream_dirs["out"]).count()
    assert n1 > 0

    # second cycle with no new files: nothing re-processed
    q2 = run_watcher_once(spark, stream_dirs["in"], stream_dirs["out"],
                          stream_dirs["ckpt"], cfg)
    q2.awaitTermination(120)
    assert spark.read.parquet(stream_dirs["out"]).count() == n1

    # a late file arrives; next cycle picks up ONLY it
    _write_pages(corpus, slice(40, 60),
                 os.path.join(stream_dirs["in"], "batch1.parquet"))
    q3 = run_watcher_once(spark, stream_dirs["in"], stream_dirs["out"],
                          stream_dirs["ckpt"], cfg)
    q3.awaitTermination(120)
    out = spark.read.parquet(stream_dirs["out"]).toPandas()
    assert len(out) > n1
    assert out.url.is_unique or out.page.notna().any()  # no dup docs


def test_stream_matches_batch(spark, corpus, cfg, stream_dirs):
    """Streaming extraction output == batch pipeline output."""
    from document_extractor_spark.pipeline import run_extraction
    from document_extractor_spark.streaming import run_watcher_once

    q = run_watcher_once(spark, stream_dirs["in"], stream_dirs["out"],
                         stream_dirs["ckpt"], cfg)
    q.awaitTermination(120)
    got = (
        spark.read.parquet(stream_dirs["out"])
        .select("url", "page", "method", "status", "text")
        .toPandas().sort_values(["url", "page"]).reset_index(drop=True)
    )
    batch_in = spark.read.parquet(
        os.path.join(stream_dirs["in"], "batch0.parquet"))
    want = (
        run_extraction(spark, batch_in, cfg, persist=False).extracted
        .select("url", "page", "method", "status", "text")
        .toPandas().sort_values(["url", "page"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].fillna("~") == want[c].fillna("~")).all(), c
