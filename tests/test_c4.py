"""C4 cleaning heuristics (Raffel et al. 2020 §2.2)."""
import pandas as pd


def test_c4_rules(spark):
    from document_extractor_spark.functions.c4 import c4_clean

    rows = [
        (0, "A good long sentence with many words here.\n"
            "Another proper sentence that also has enough words.\n"
            "And one final closing sentence for the page."),
        (1, "lorem ipsum dolor sit amet. More text here okay.\n"
            "Sentences one. Sentences two. Sentences three."),
        (2, "Some code follows { return 1; } done. Two more here. Three."),
        (3, "Short. Yes. No."),                       # lines under 5 words
        (4, "no terminal punctuation on this line at all\n"
            "second line also missing punctuation marks here\n"
            "third one too. but this. has sentences. many of them."),
        (5, "Please enable javascript to continue reading now.\n"
            "This normal sentence with enough words survives fine.\n"
            "Another survivor sentence with plenty of words too."),
        (6, None),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = c4_clean(df).toPandas().set_index("doc_id")

    assert got.loc[0, "keep"] and got.loc[0, "n_lines_kept"] == 3
    assert got.loc[0, "kept_text"].startswith("A good long")
    assert got.loc[1, "drop_reason"] == "lorem_ipsum"
    assert got.loc[2, "drop_reason"] == "curly_brace"
    assert got.loc[3, "drop_reason"] == "no_surviving_lines"
    # doc 4: unpunctuated lines die, the punctuated one survives
    assert got.loc[4, "n_lines_kept"] == 1
    assert got.loc[4, "keep"]
    # doc 5: the javascript line dies, two survivors
    assert got.loc[5, "n_lines_kept"] == 2
    assert "javascript" not in got.loc[5, "kept_text"]
    for i in (6, 7):
        assert not got.loc[i, "keep"]
        assert got.loc[i, "drop_reason"] == "too_few_sentences"
        assert got.loc[i, "kept_text"] == ""
    # page precedence: lorem beats curly beats sentence count
    both = spark.createDataFrame(
        [(0, "lorem ipsum { x }")], "doc_id long, text string")
    assert c4_clean(both).toPandas().drop_reason[0] == "lorem_ipsum"


def test_c4_zero_shuffle_zero_python(spark):
    from document_extractor_spark.functions.c4 import c4_clean

    df = spark.createDataFrame([(0, "x.")], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for m in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert m not in plan
