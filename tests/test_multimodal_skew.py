"""Multimodal plumbing + salted-skew aggregation tests."""
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + bytes(range(200))),
        (1, b"\xff\xd8\xff\xe0" + bytes(200)),
        (2, b"RIFF" + bytes(4) + b"WAVEfmt " + bytes(64)),
        (3, b"\x00\x00\x00\x18ftypmp42" + bytes(400)),
        (4, b"garbage-bytes-here"),
    ]
    return spark.createDataFrame(rows, "id long, media binary")


def test_media_meta(spark, media):
    from document_extractor_spark.operators.multimodal import (
        media_meta_table,
    )

    got = media_meta_table(media).toPandas().set_index("id")
    assert got.loc[0, "kind"] == "image/png"
    assert got.loc[1, "kind"] == "image/jpeg"
    assert got.loc[2, "kind"] == "audio/wav"
    assert got.loc[3, "kind"] == "video/mp4"
    assert got.loc[4, "kind"] == "binary/unknown"
    # image rows get (stub) dimensions; audio/video get duration
    assert got.loc[0, "width"] > 0 and got.loc[0, "height"] > 0
    assert got.loc[2, "duration_ms"] > 0


def test_media_features_deterministic(spark, media):
    from document_extractor_spark.operators.multimodal import (
        media_feature_table,
    )

    a = media_feature_table(media).toPandas().set_index("id")
    b = media_feature_table(media).toPandas().set_index("id")
    for i in a.index:
        assert list(a.loc[i, "feature"]) == list(b.loc[i, "feature"])
        assert len(a.loc[i, "feature"]) == 8


def test_frame_sampling(spark, media):
    from document_extractor_spark.operators.multimodal import (
        sampled_frames_table,
    )

    got = sampled_frames_table(media, stride=2, max_frames=4).toPandas()
    vid = got[got.id == 3]
    assert len(vid) == 4
    assert list(vid.frame_idx) == [0, 1, 2, 3]
    assert all(len(b) > 0 for b in vid.frame_bytes)


def test_salted_agg_matches_plain(spark):
    """Salted two-phase aggregation must equal the plain groupBy."""
    from document_extractor_spark.operators.skew import salted_agg

    rows = [(f"key{i % 3}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    salted = salted_agg(
        df, "k",
        {"n": ("count", "v"), "total": ("sum", "v"), "mx": ("max", "v")},
        salt_factor=8,
    ).toPandas().set_index("k").sort_index()
    plain = df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("total"),
        F.max("v").alias("mx")).toPandas().set_index("k").sort_index()
    assert (salted.n == plain.n).all()
    assert (salted.total == plain.total).all()
    assert (salted.mx == plain.mx).all()


def test_domain_stats_salted(spark, extraction):
    """Domain stats over the extracted corpus: salted result equals a
    plain pandas recompute, and hot domains dominate (skew exists)."""
    from document_extractor_spark.operators.skew import domain_stats_salted

    ext = extraction["extracted"].drop(columns=["spans"])
    got = (
        domain_stats_salted(spark.createDataFrame(ext), salt_factor=8)
        .toPandas().set_index("domain").sort_index()
    )
    want = ext.copy()
    want["domain"] = want.url.str.extract(r"^[a-z]+://([^/]+)/")
    want_docs = want.groupby("domain").url.count()
    assert (got.docs.sort_index() == want_docs.sort_index()).all()
    hot = got.docs.sort_values(ascending=False)
    assert hot.iloc[0] > hot.iloc[-1]  # skewed by construction
