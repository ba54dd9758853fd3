import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_extractor_spark.config import PipelineConfig  # noqa: E402
from document_extractor_spark.corpus import generate_corpus  # noqa: E402
from document_extractor_spark.session import build_session  # noqa: E402

CORPUS_N = 240


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="des-tests", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus():
    # pdf_big fixtures have 8 pages; cfg below switches per-page at 6
    return generate_corpus(CORPUS_N, seed=42, big_pdf_pages=8)


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig(bigdoc_page_limit=6)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    return spark.createDataFrame(corpus.pages).repartition(8).cache()


@pytest.fixture(scope="session")
def extraction(spark, pages_df, corpus, cfg):
    """Run the full pipeline once; reused across golden tests."""
    from document_extractor_spark.pipeline import run_extraction

    res = run_extraction(spark, pages_df, cfg)
    return {
        "extracted": res.extracted.toPandas(),
        "quarantine": res.quarantine.toPandas(),
        "metrics": res.metrics.toPandas(),
    }
