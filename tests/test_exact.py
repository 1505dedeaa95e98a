from __future__ import annotations

from pyspark.sql import functions as F

from deduplicate_spark.operators.assembly import assemble_docs
from deduplicate_spark.operators.exact import (
    collision_groups,
    duplicate_group_report,
    exact_clusters,
    exact_pairs,
    semi_join_collisions,
)


def _docs(spark):
    rows = [
        ("a1", 0, "user", "same content here", "", None),
        ("a2", 0, "user", "same content here", "", None),
        ("a3", 0, "user", "same content here", "", None),
        ("u1", 0, "user", "unique snowflake one", "", None),
        ("u2", 0, "user", "unique snowflake two", "", None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    return assemble_docs(turns)


def test_collision_groups(spark):
    docs = _docs(spark)
    groups = collision_groups(docs, "exact_sha").collect()
    assert len(groups) == 1
    assert groups[0]["n_members"] == 3


def test_semi_join_collisions(spark):
    docs = _docs(spark)
    hot = semi_join_collisions(docs, "exact_sha")
    assert sorted(r["conv_id"] for r in hot.collect()) == ["a1", "a2", "a3"]


def test_exact_clusters(spark):
    docs = _docs(spark)
    rows = exact_clusters(docs).collect()
    assert sorted((r["conv_id"], r["cluster_id"]) for r in rows) == [
        ("a1", "a1"),
        ("a2", "a1"),
        ("a3", "a1"),
    ]


def test_exact_pairs(spark):
    docs = _docs(spark)
    pairs = sorted((r["a"], r["b"]) for r in exact_pairs(docs).collect())
    assert pairs == [("a1", "a2"), ("a1", "a3"), ("a2", "a3")]


def test_duplicate_group_report(spark):
    docs = _docs(spark)
    rep = duplicate_group_report(docs).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_members"] == 3 and r["cluster_id"] == "a1"
    doc_len = len("same content here")
    assert r["group_len"] == 3 * doc_len
    assert r["reclaimable_len"] == 2 * doc_len
