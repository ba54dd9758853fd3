"""Text-analysis function tests: tokens, language-ID, quality,
fingerprints, winnowing (+ accuracy on the multilingual corpus)."""
import pytest

from pyspark.sql import functions as F

from document_extractor_spark.functions import textstats as TS


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (0, "The cat and the dog sat of the mat.", "en"),
        (1, "Der Hund und die Katze und der Vogel.", "de"),
        (2, "Le chat et les chiens et le lapin.", "fr"),
        (3, "El gato y los perros y el conejo.", "es"),
        (4, "xyzzy plugh", "unknown"),
        (5, "", "unknown"),
    ]
    return spark.createDataFrame(rows, "id long, text string, lang string")


def test_token_count(spark, tdf):
    got = tdf.select("id", TS.token_count(F.col("text")).alias("n")) \
        .toPandas().set_index("id").n
    # "The cat and the dog sat of the mat." -> 9 words + 1 period
    assert got.loc[0] == 10
    assert got.loc[4] == 2
    assert got.loc[5] == 0


def test_predict_lang(spark, tdf):
    got = tdf.select("lang", TS.predict_lang(F.col("text"))
                     .alias("p")).toPandas()
    assert (got.lang == got.p).all()


def test_langid_on_corpus(spark, corpus):
    """On the multilingual synthetic corpus, marker-word language-ID
    must beat 90% accuracy for en/de/fr docs with >= 30 tokens."""
    exp = corpus.pages[["url", "lang"]].merge(
        corpus.expected[["url", "extracted_text"]], on="url")
    exp = exp[exp.extracted_text.str.split().str.len() >= 30]
    df = spark.createDataFrame(exp[["url", "extracted_text", "lang"]])
    got = df.select(
        "lang", TS.predict_lang(F.col("extracted_text")).alias("p")
    ).toPandas()
    acc = (got.lang == got.p).mean()
    assert acc >= 0.9, f"langid accuracy {acc:.3f}"


def test_quality_score_bounds(spark, tdf):
    got = tdf.select(TS.quality_score(F.col("text")).alias("q")).toPandas().q
    assert ((got >= 0) & (got <= 1)).all()


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "  HELLO WORLD \n")],
        "id long, text string")
    got = df.select(TS.fingerprint(F.col("text")).alias("fp")).toPandas().fp
    assert got.nunique() == 1  # all normalize to the same content


def test_winnow_properties():
    fps = TS.winnow("the quick brown fox jumps over the lazy dog")
    assert fps and all(f >= 0 for f in fps)
    assert fps == TS.winnow("the quick brown fox jumps over the lazy dog")
    assert TS.winnow("") == [] and TS.winnow("abc", k=8) == []
    # a shared long substring yields shared fingerprints
    a = set(TS.winnow("PREFIX the common middle section here SUFFIX1"))
    b = set(TS.winnow("OTHERS the common middle section here SUFFIX2"))
    assert a & b


def test_ascii_ratio_matches_sql_semantics(spark, tdf):
    got = tdf.select("id", TS.ascii_alnum_ratio(F.col("text"))
                     .alias("r")).toPandas().set_index("id").r
    text = "The cat and the dog sat of the mat."
    import re
    want = len(re.findall(r"[0-9A-Za-z]", text)) / len(text)
    assert abs(got.loc[0] - want) < 1e-12
    assert got.loc[5] == 0.0


def test_dup_ratios(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"),            # all unique
         (1, "a a a a"),            # 3/4 dup words, 2/3 dup bigrams
         (2, "a b a b a"),          # 3/5 dup words, bigrams: ab ba ab ba
         (3, "solo"),               # single word: bigram ratio 0
         (4, "")],                  # empty
        "id long, text string")
    got = df.select(
        "id",
        TS.dup_unigram_ratio(F.col("text")).alias("du"),
        TS.dup_bigram_ratio(F.col("text")).alias("db"),
    ).toPandas().set_index("id")
    assert got.du.loc[0] == 0.0 and got.db.loc[0] == 0.0
    assert abs(got.du.loc[1] - 0.75) < 1e-12
    assert abs(got.db.loc[1] - 2 / 3) < 1e-12
    assert abs(got.du.loc[2] - 0.6) < 1e-12
    assert abs(got.db.loc[2] - 0.5) < 1e-12
    assert got.du.loc[3] == 0.0 and got.db.loc[3] == 0.0
    assert got.db.loc[4] == 0.0


def test_dup_ratios_hypothesis_parity(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["a", "b", "c", "ab", "xyz", ""])
    texts = st.lists(st.lists(words, min_size=0, max_size=12)
                     .map(" ".join), min_size=1, max_size=8)

    def py_ratios(t):
        # the pinned whitespace class with empties removed — runs of
        # spaces must not fabricate duplicate '' words
        import re
        w = [x for x in re.split("[ \t\n\x0b\f\r]+", t) if x != ""]
        du = 1 - len(set(w)) / len(w) if len(w) > 0 else 0.0
        grams = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        db = 1 - len(set(grams)) / len(grams) if len(w) >= 2 else 0.0
        return du, db

    @settings(max_examples=20, deadline=None)
    @given(texts)
    def check(ts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ts)], "id long, text string")
        got = df.select(
            "id",
            TS.dup_unigram_ratio(F.col("text")).alias("du"),
            TS.dup_bigram_ratio(F.col("text")).alias("db"),
        ).toPandas().set_index("id")
        for i, t in enumerate(ts):
            du, db = py_ratios(t)
            assert abs(got.du.loc[i] - du) < 1e-12, (t, du, got.du.loc[i])
            assert abs(got.db.loc[i] - db) < 1e-12, (t, db, got.db.loc[i])

    check()


def test_approx_distinct_error_bound(spark):
    import __spark_entry__ as E

    got = E.queries()["approx_distinct_stats"](
        spark, "/root/testdata/sf0.01").toPandas()
    assert (got.exact_users > 0).all()
    rel_err = (got.approx_users - got.exact_users).abs() / got.exact_users
    assert (rel_err < 0.05).all(), rel_err


def test_legacy_stopwords_match_reference_ascii_entries():
    """LEGACY_STOPWORDS must equal exactly the pure-ascii-alpha entries
    of the reference's embedded awk list (common_pdf.sh:87-96, verbatim
    below). Entries with a Unicode apostrophe can never match after the
    awk tokenizer's [^a-z]->space mapping, so only ascii-alpha entries
    are effective — a missing one ('why' was dropped once) silently
    shifts W-ratio for any text containing it."""
    ref_raw = (
        "a an and are as at be but by for from has have if in into is it its "
        "of on or that the their there these they this to was were what when "
        "where which who will with without within would about above after "
        "again against all also any because been before being below between "
        "both did do does doing down during each few further he her here "
        "hers herself him himself his how i into itself just me more most "
        "my myself no nor not now off once only other our ours ourselves "
        "out over own same she should so some such than then there’s "
        "they’re those through too under until up very we were "
        "what’s when’s where’s who’s why will you your "
        "yours yourself yourselves"
    ).split()
    ascii_alpha = {w for w in ref_raw if w.isascii() and w.isalpha()}
    assert set(TS.LEGACY_STOPWORDS) == ascii_alpha
