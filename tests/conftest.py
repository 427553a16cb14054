from __future__ import annotations

import pandas as pd
import pytest

from smart_pdf_md_spark.corpus import corpus_pandas
from smart_pdf_md_spark.session import build_session

SF_SMALL = 400  # unit/correctness corpus size (FIXTURES.md sf-small scaled for test speed)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="kg-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf() -> pd.DataFrame:
    return corpus_pandas(SF_SMALL)


@pytest.fixture(scope="session")
def corpus_sdf(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf)
    df.persist()
    df.count()
    return df
