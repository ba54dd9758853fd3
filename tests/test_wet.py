"""WET conversion-record export: JVM/Python builder byte parity,
shard determinism, writer manifest."""
from __future__ import annotations

import glob
import os

from document_extractor_spark.functions.warc_mini import (
    build_conversion_record,
    parse_warc,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jvm_record_matches_python_builder(spark):
    from document_extractor_spark.artifacts import wet_records

    rows = [(0, "plain text"), (61, "unicode € snö"),
            (125, ""), (7, None), (999, "line one\nline two")]
    got = {r["doc_id"]: r["record"]
           for r in wet_records(_docs(spark, rows)).collect()}
    for did, text in rows:
        uri = f"https://example.com/doc/{did}"
        date = (f"2026-01-01T00:{(did // 60) % 60:02d}:"
                f"{did % 60:02d}Z")
        want = build_conversion_record(uri, date, text or "")
        assert got[did].encode("utf-8") == want, did


def test_records_parse_back_as_warc(spark):
    # the WET stream is itself a valid ISO 28500 file: our reader
    # must round-trip it (uncompressed concatenation)
    from document_extractor_spark.artifacts import wet_records

    rows = [(1, "alpha"), (2, "beta é")]
    recs = [r["record"].encode("utf-8")
            for r in wet_records(_docs(spark, rows)).collect()]
    parsed = parse_warc(b"".join(recs))
    ok = [p for p in parsed if p.error is None]
    assert len(ok) == 2
    assert sorted(p.payload.decode("utf-8") for p in ok) == \
        ["alpha", "beta é"]


def test_written_shards_parse_as_warc(spark, tmp_path):
    from document_extractor_spark.artifacts import write_wet_shards

    df = _docs(spark, [(i, f"doc number {i}") for i in range(20)])
    out = str(tmp_path / "wetp")
    man = {r["shard"]: r["n_records"]
           for r in write_wet_shards(df, out, n_shards=2).collect()}
    for shard, n in man.items():
        data = b"".join(open(f, "rb").read() for f in sorted(
            glob.glob(os.path.join(out, f"shard={shard}", "part-*"))))
        recs = parse_warc(data)
        assert [r.error for r in recs] == [None] * n
        assert all(r.payload.decode("utf-8").startswith("doc number")
                   for r in recs)


def test_writer_manifest_and_bytes(spark, tmp_path):
    from document_extractor_spark.artifacts import (
        wet_records, write_wet_shards)

    df = _docs(spark, [(i, f"doc number {i}") for i in range(40)])
    out = str(tmp_path / "wet")
    man = {r["shard"]: (r["n_records"], r["n_bytes"])
           for r in write_wet_shards(df, out, n_shards=4).collect()}
    assert sum(n for n, _ in man.values()) == 40
    for shard, (n, nbytes) in man.items():
        files = glob.glob(os.path.join(out, f"shard={shard}", "part-*"))
        total = sum(os.path.getsize(f) for f in files)
        assert total == nbytes
    # deterministic bytes under different input partitioning
    man2 = {r["shard"]: (r["n_records"], r["n_bytes"])
            for r in write_wet_shards(
                df.repartition(7), out + "2", n_shards=4).collect()}
    assert man == man2
    for shard in man:
        a = b"".join(open(f, "rb").read() for f in sorted(
            glob.glob(os.path.join(out, f"shard={shard}", "part-*"))))
        b = b"".join(open(f, "rb").read() for f in sorted(
            glob.glob(os.path.join(out + "2", f"shard={shard}",
                                   "part-*"))))
        assert a == b
