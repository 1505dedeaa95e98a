from __future__ import annotations

import pytest

from deduplicate_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a string, b string")
    rows = connected_components(df).collect()
    return {r["conv_id"]: r["cluster_id"] for r in rows}


def test_single_edge(spark):
    assert _cc(spark, [("a", "b")]) == {"a": "a", "b": "a"}


def test_chain_converges_to_min(spark):
    """Chains (the non-transitive near-dup worry) still collapse to one
    component with min-id label."""
    labels = _cc(spark, [("c", "d"), ("b", "c"), ("a", "b"), ("d", "e")])
    assert set(labels.values()) == {"a"}
    assert len(labels) == 5


def test_two_components(spark):
    labels = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert labels["a"] == labels["b"] == "a"
    assert labels["x"] == labels["y"] == labels["z"] == "x"


def test_star_graph(spark):
    labels = _cc(spark, [("m", f"n{i}") for i in range(10)])
    assert set(labels.values()) == {"m"}


def test_cc_is_partition(spark):
    """Every node gets exactly one label (clustering is a partition)."""
    edges = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("r", "p")]
    df = spark.createDataFrame(edges, "a string, b string")
    out = connected_components(df)
    assert out.groupBy("conv_id").count().filter("count > 1").count() == 0


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "a string, b string")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=0)
