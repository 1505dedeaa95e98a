from __future__ import annotations

from pyspark.sql import functions as F

from deduplicate_spark.operators.resolve import actions, cluster_report, elect_canonical


def _fixture(spark):
    """One cluster spanning two sources: src_big holds 2 copies, src_small 1.
    Doc-ranking winner is the longest doc (in src_small); group-ranking
    winner must come from src_big (the superset source)."""
    clusters = spark.createDataFrame(
        [("src_big/a", "c1"), ("src_big/b", "c1"), ("src_small/a", "c1")],
        "conv_id string, cluster_id string",
    )
    docs = spark.createDataFrame(
        [
            ("src_big/a", 3, 300),
            ("src_big/b", 3, 290),
            ("src_small/a", 4, 400),
        ],
        "conv_id string, n_turns int, total_len long",
    )
    return clusters, docs


def test_doc_policy_prefers_largest_doc(spark):
    clusters, docs = _fixture(spark)
    got = elect_canonical(clusters, docs, policy="doc").collect()
    assert all(r["canonical_conv_id"] == "src_small/a" for r in got)


def test_group_policy_prefers_superset_source(spark):
    clusters, docs = _fixture(spark)
    got = elect_canonical(clusters, docs, policy="group").collect()
    assert all(r["canonical_conv_id"] == "src_big/a" for r in got)


def test_election_deterministic_on_ties(spark):
    clusters = spark.createDataFrame(
        [("x/b", "c"), ("x/a", "c")], "conv_id string, cluster_id string"
    )
    docs = spark.createDataFrame(
        [("x/a", 1, 10), ("x/b", 1, 10)], "conv_id string, n_turns int, total_len long"
    )
    got = elect_canonical(clusters, docs).collect()
    assert all(r["canonical_conv_id"] == "x/a" for r in got)  # min conv_id tie-break


def test_actions_freed_len(spark):
    clusters, docs = _fixture(spark)
    acts = {r["conv_id"]: r for r in actions(clusters, docs).collect()}
    assert acts["src_small/a"]["action"] == "keep"
    assert acts["src_small/a"]["freed_len"] == 0
    assert acts["src_big/a"]["action"] == "delete"
    assert acts["src_big/a"]["freed_len"] == 300


def test_cluster_report_compaction(spark):
    clusters, docs = _fixture(spark)
    rep = cluster_report(actions(clusters, docs)).collect()
    assert len(rep) == 1
    assert rep[0]["n_members"] == 3
    assert rep[0]["n_deletes"] == 2
    assert rep[0]["reclaimable_len"] == 590
