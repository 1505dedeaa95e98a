from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicate_spark.functions.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_sim,
    embedding_dup_pairs,
)

DIM = 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, DIM))
    # plant near-identical pairs: vec 50+i ~ vec i for i < 5
    rows = [(i, base[i].tolist()) for i in range(40)]
    for i in range(5):
        rows.append((50 + i, (base[i] + rng.standard_normal(DIM) * 0.01).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_cosine_sim_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [round(r[0], 6) for r in df.select(cosine_sim(F.col("a"), F.col("b"))).collect()]
    assert got == [1.0, 0.0]


def test_brute_force_topk_finds_planted(vectors):
    queries = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    top = brute_force_topk(vectors, queries, k=2).collect()
    best = {r["q_id"]: r["neighbor_id"] for r in top if r["rnk"] == 2}
    # rnk=1 is the query itself (not filtered here); rnk=2 = planted twin
    for q in range(5):
        assert best[q] == 50 + q


def test_ann_topk_recalls_planted(vectors):
    queries = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    top = ann_topk(vectors, queries, dim=DIM, k=3, n_tables=12, n_bits=8).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["q_id"], []).append(r["neighbor_id"])
    hits = sum(1 for q in range(5) if 50 + q in by_q.get(q, []))
    assert hits >= 4  # >= 80% recall of planted twins


def test_embedding_dup_pairs(vectors):
    pairs = embedding_dup_pairs(vectors, dim=DIM, threshold=0.98, n_tables=12, n_bits=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    expected = {(i, 50 + i) for i in range(5)}
    assert expected <= got
    # no random pair sneaks past the cosine threshold
    assert all(b - a == 50 for a, b in got)
