"""The reference's pinned semantics: default dedup equivalence is the
FINGERPRINT, not the content. test_complete_hash_false
(/root/reference/test_dupe_analysis.py:498-526) asserts a crafted
fingerprint-collision IS grouped by default; test_complete_hash (469-496)
asserts full-content hashing separates it.

Transcript analog: a cyclic rotation of a document keeps (almost) the same
char-shingle set — MinHash/LSH groups it with the original; exact
confirmation (complete_hash=True) must split it."""

from __future__ import annotations

import pytest

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def collision_turns(spark):
    # aperiodic base (distinct numbered words) so a rotation is NOT
    # content-equal but keeps (almost) the same shingle set
    base = " ".join(f"word{i:03d}" for i in range(240))
    half = len(base) // 2
    rotated = base[half:] + " " + base[:half]
    fillers = [
        f"completely unrelated filler document number {i} with its own words "
        * 4
        for i in range(4)
    ]
    rows = [("orig", 0, "user", base, "", None), ("rot", 0, "user", rotated, "", None)]
    rows += [(f"fill{i}", 0, "user", t, "", None) for i, t in enumerate(fillers)]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_fingerprint_collision_grouped_by_default(spark, collision_turns):
    res = run_pipeline(spark, collision_turns, DedupConfig())
    clusters = {r["conv_id"]: r["cluster_id"] for r in res.clusters.collect()}
    assert clusters.get("orig") is not None, "rotation not caught at approximate level"
    assert clusters.get("orig") == clusters.get("rot")


def test_complete_hash_separates_collision(spark, collision_turns):
    res = run_pipeline(spark, collision_turns, DedupConfig(complete_hash=True))
    clusters = {r["conv_id"]: r["cluster_id"] for r in res.clusters.collect()}
    # not exact-content-equal -> no cluster membership in strict mode
    assert "orig" not in clusters
    assert "rot" not in clusters
