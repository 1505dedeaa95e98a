from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.datagen import generate_transcripts
from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA
from deduplicate_spark.streaming.incremental import IncrementalState, process_batch


@pytest.fixture()
def state(tmp_path):
    return IncrementalState(
        docs_path=str(tmp_path / "docs"),
        signatures_path=str(tmp_path / "sigs"),
        pairs_path=str(tmp_path / "pairs"),
    )


def test_incremental_two_batches_finds_cross_batch_dup(spark, state):
    """Crossover dups only detectable post-merge — the reference's
    test_db_merge contract (test_dupe_analysis.py:377-467), incremental."""
    turns_pd, _ = generate_transcripts(n_base=30, seed=11)
    # batch 1: originals; batch 2: the planted copies (dup*/ prefixes)
    is_copy = turns_pd["conv_id"].str.startswith(("dupx/", "dupn/", "mirror"))
    b1 = spark.createDataFrame(turns_pd[~is_copy], TRANSCRIPTS_SCHEMA)
    b2 = spark.createDataFrame(turns_pd[is_copy], TRANSCRIPTS_SCHEMA)

    cfg = DedupConfig()
    m1 = process_batch(spark, b1, state, cfg, first_batch=True)
    assert m1["batch_docs"] > 0

    m2 = process_batch(spark, b2, state, cfg, first_batch=False)
    # the copies duplicate batch-1 content: exact fast path must fire
    assert m2["instant_exact_dupes"] > 0 or m2["new_pairs"] > 0

    pairs = spark.read.parquet(state.pairs_path)
    cross = pairs.filter(
        (F.col("a").startswith("dup") | F.col("a").startswith("mirror"))
        != (F.col("b").startswith("dup") | F.col("b").startswith("mirror"))
    )
    assert cross.count() > 0  # cross-batch near edges exist


def test_incremental_never_recomputes_old_content(spark, state):
    """Batch 2 re-sends identical conversations: every doc hits the exact
    fast path; zero new signatures computed (the F2 incremental filter)."""
    turns_pd, _ = generate_transcripts(n_base=10, seed=13)
    df = spark.createDataFrame(turns_pd, TRANSCRIPTS_SCHEMA)
    cfg = DedupConfig()
    process_batch(spark, df, state, cfg, first_batch=True)

    renamed = turns_pd.copy()
    renamed["conv_id"] = "rerun/" + renamed["conv_id"]
    df2 = spark.createDataFrame(renamed, TRANSCRIPTS_SCHEMA)
    m2 = process_batch(spark, df2, state, cfg, first_batch=False)
    assert m2["instant_exact_dupes"] == m2["batch_docs"]
    assert m2["new_signatures"] == 0
