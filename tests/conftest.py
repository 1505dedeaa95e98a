from __future__ import annotations

import pandas as pd
import pytest

from deduplicate_spark.datagen import generate_transcripts
from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA
from deduplicate_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deduplicate_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """(turns_pandas, manifest) — deterministic planted-duplicate corpus."""
    return generate_transcripts(n_base=80, seed=42)


@pytest.fixture(scope="session")
def turns_df(spark, corpus):
    turns_pd, _ = corpus
    return spark.createDataFrame(turns_pd, schema=TRANSCRIPTS_SCHEMA).cache()


@pytest.fixture(scope="session")
def manifest(corpus) -> pd.DataFrame:
    _, m = corpus
    return pd.DataFrame([vars(p) for p in m])
