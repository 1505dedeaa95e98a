"""Nested-family golden semantics (reference test_nested*,
/root/reference/test_deduplicate.py:275-459): when an entire source tree is
a copy of another, the rollup must flag the copy tree fully-deletable while
the original keeps its members."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.operators.rollup import group_rollup
from deduplicate_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def family_result(spark):
    rows = []
    texts = {
        "a": "first conversation body with clearly distinct content alpha " * 3,
        "b": "second conversation body entirely different material bravo " * 3,
        "c": "third conversation body with its own unique wording charlie " * 3,
    }
    # original tree holds a,b,c plus one unique extra; mirror holds only a,b,c
    for name, text in texts.items():
        rows.append((f"orig/{name}", 0, "user", text, "", None))
        rows.append((f"mirror/{name}", 0, "user", text, "", None))
    rows.append(("orig/unique", 0, "user", "only in the original tree delta " * 3, "", None))
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    res = run_pipeline(spark, turns, DedupConfig())
    # group policy: keep the superset tree's copies
    from deduplicate_spark.operators.resolve import actions as make_actions

    acts = make_actions(res.clusters, res.docs, policy="group")
    return res, acts


def test_mirror_tree_fully_deletable(spark, family_result):
    res, acts = family_result
    roll = {r["group_prefix"]: r for r in group_rollup(acts, res.docs).collect()}
    assert roll["mirror"]["is_full_dupe"]  # every mirror member is a duplicate
    assert not roll["orig"]["is_full_dupe"]  # orig/unique is not


def test_group_election_keeps_original_tree(spark, family_result):
    _res, acts = family_result
    by_conv = {r["conv_id"]: r["action"] for r in acts.collect()}
    # orig has 4 members (superset) -> its copies win every election
    assert by_conv["orig/a"] == "keep"
    assert by_conv["orig/b"] == "keep"
    assert by_conv["orig/c"] == "keep"
    assert by_conv["mirror/a"] == "delete"
    assert by_conv["mirror/b"] == "delete"
    assert by_conv["mirror/c"] == "delete"
