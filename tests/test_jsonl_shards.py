"""JSONL training-shard export: deterministic sharding, byte-exact
lines (Spark to_json == DuckDB to_json, incl. control-char escapes),
manifest accounting, and partitioning-independent output bytes."""
from __future__ import annotations

import glob
import hashlib
import os

import duckdb


def _mod():
    # artifacts.py defines a module-level pandas_udf — import lazily,
    # after the session fixture exists
    from document_extractor_spark import artifacts
    return artifacts

_TRICKY = [
    "plain words",
    'quote " back \\ slash',
    "new\nline\ttab\rcr",
    "unicode café 中文 ß",
    "ctrl \x0b \x0c \x01 bytes",
    "",
]


def _docs(spark, n=40):
    rows = [(i, f"src{i % 3}", _TRICKY[i % len(_TRICKY)] + f" #{i}")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_lines_match_duckdb_to_json_bytes(spark):
    lines = _mod().jsonl_shard_lines(
        _docs(spark), cols=["doc_id", "source", "text"], n_shards=4)
    got = {r.doc_id: r.line for r in lines.collect()}
    con = duckdb.connect()
    for i in range(40):
        t = _TRICKY[i % len(_TRICKY)] + f" #{i}"
        exp = con.execute(
            "select to_json(struct_pack(doc_id := ?::BIGINT, "
            "source := ?, text := ?))",
            [i, f"src{i % 3}", t]).fetchone()[0]
        assert got[i] == exp, i


def test_shard_is_md5_of_key_mod_n(spark):
    lines = _mod().jsonl_shard_lines(_docs(spark), n_shards=7)
    for r in lines.collect():
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4], 16)
        assert r.shard == h % 7


def test_written_files_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = _mod().write_jsonl_shards(
        _docs(spark), out, cols=["doc_id", "source", "text"],
        n_shards=4).collect()
    assert sum(m.n_lines for m in manifest) == 40
    for m in manifest:
        files = glob.glob(os.path.join(out, f"shard={m.shard}", "part-*"))
        blob = b"".join(open(f, "rb").read() for f in sorted(files))
        assert len(blob) == m.n_bytes  # manifest counts the real bytes
        # every line is valid standalone JSON with the right keys
        import json
        for ln in blob.decode("utf-8").splitlines():
            rec = json.loads(ln)
            assert set(rec) <= {"doc_id", "source", "text"}
        # within-shard order is the md5 walk of the key (deterministic)
        ids = [json.loads(ln)["doc_id"]
               for ln in blob.decode().splitlines()]
        assert ids == sorted(
            ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())


def test_output_bytes_independent_of_input_partitioning(spark, tmp_path):
    d = _docs(spark)
    blobs = []
    for j, df in enumerate([d.repartition(1), d.repartition(13, "source")]):
        out = str(tmp_path / f"v{j}")
        _mod().write_jsonl_shards(
            df, out, cols=["doc_id", "text"], n_shards=3).collect()
        shard_bytes = {}
        for sd in glob.glob(os.path.join(out, "shard=*")):
            files = sorted(glob.glob(os.path.join(sd, "part-*")))
            shard_bytes[os.path.basename(sd)] = b"".join(
                open(f, "rb").read() for f in files)
        blobs.append(shard_bytes)
    assert blobs[0] == blobs[1]


def test_empty_input(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty")
    assert _mod().write_jsonl_shards(empty, out, n_shards=2).count() == 0


def test_null_fields_render_as_json_null(spark):
    """ignoreNullFields=false: a NULL column renders as "field":null,
    matching DuckDB byte-for-byte and keeping line schema stable
    (Spark's default silently DROPS null fields per row)."""
    docs = spark.createDataFrame(
        [(1, None, "x"), (2, "de", None), (3, None, None)],
        "doc_id long, lang string, text string")
    lines = {r.doc_id: r.line for r in _mod().jsonl_shard_lines(
        docs, cols=["doc_id", "lang", "text"], n_shards=2).collect()}
    con = duckdb.connect()
    for i, lang, text in [(1, None, "x"), (2, "de", None),
                          (3, None, None)]:
        exp = con.execute(
            "select to_json(struct_pack(doc_id := ?::BIGINT, "
            "lang := ?, text := ?))", [i, lang, text]).fetchone()[0]
        assert lines[i] == exp
        assert '"lang"' in lines[i] and '"text"' in lines[i]
