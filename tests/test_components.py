from __future__ import annotations

import pytest

from deduplicate_spark.operators.components import connected_components


import pytest as _pytest


@_pytest.fixture(params=[0, 5_000_000], ids=["distributed", "driver"])
def driver_max(request):
    """Run every CC test through BOTH the distributed label-prop loop
    (driver_max_edges=0) and the driver union-find fast path."""
    return request.param


def _cc(spark, edges, driver_max_edges):
    df = spark.createDataFrame(edges, "a string, b string")
    rows = connected_components(df, driver_max_edges=driver_max_edges).collect()
    return {r["conv_id"]: r["cluster_id"] for r in rows}


def test_single_edge(spark, driver_max):
    assert _cc(spark, [("a", "b")], driver_max) == {"a": "a", "b": "a"}


def test_driver_cc_byte_gate_falls_back_to_distributed(spark, monkeypatch):
    """VERDICT r4 #4: the driver fast path is gated on ESTIMATED BYTES, not
    just rows — string-id edge lists that would blow the driver fall back
    to the distributed loop (simulated by shrinking the byte budget)."""
    from deduplicate_spark.operators import components as comp

    monkeypatch.setattr(comp, "DRIVER_CC_MAX_BYTES", 1)
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")], 5_000_000)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_converges_to_min(spark, driver_max):
    """Chains (the non-transitive near-dup worry) still collapse to one
    component with min-id label."""
    labels = _cc(spark, [("c", "d"), ("b", "c"), ("a", "b"), ("d", "e")], driver_max)
    assert set(labels.values()) == {"a"}
    assert len(labels) == 5


def test_two_components(spark, driver_max):
    labels = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")], driver_max)
    assert labels["a"] == labels["b"] == "a"
    assert labels["x"] == labels["y"] == labels["z"] == "x"


def test_star_graph(spark, driver_max):
    labels = _cc(spark, [("m", f"n{i}") for i in range(10)], driver_max)
    assert set(labels.values()) == {"m"}


def test_cc_is_partition(spark, driver_max):
    """Every node gets exactly one label (clustering is a partition)."""
    edges = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("r", "p")]
    df = spark.createDataFrame(edges, "a string, b string")
    out = connected_components(df, driver_max_edges=driver_max)
    assert out.groupBy("conv_id").count().filter("count > 1").count() == 0


def test_both_paths_agree(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "p")]
    dist = _cc(spark, edges, 0)
    drv = _cc(spark, edges, 10**6)
    assert dist == drv


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "a string, b string")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=0, driver_max_edges=0)
