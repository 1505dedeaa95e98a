"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; broadcast the query set,
    native zip_with/aggregate dot products, window top-k. O(N*Q) but fully
    JVM-side and embarrassingly parallel: correct choice when Q is small.
  * LSH-bucketed ANN (random hyperplane / SRP) — a scale path: docs and
    queries hash to sign-pattern buckets; candidates = bucket collisions
    across any of ``n_tables`` hash tables; exact cosine re-rank on
    candidates only. Sub-linear candidate volume at 100 TB scale, tunable
    recall via (n_tables, n_bits).
  * IVF-partitioned ANN — the other scale path: a tiny coarse-centroid
    table partitions the corpus into inverted-file cells (zero-shuffle
    literal projection, or a matmul kernel for large cell counts); each
    query probes its ``nprobe`` nearest cells and re-ranks exactly only
    inside them. Deterministic smallest-id quantizer for oracle-able
    tests; k-means|| (Spark ML, sampled) for production.

The hyperplane projection is a vectorized pandas UDF (numpy matmul over
Arrow batches); everything relational stays native.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(c: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Native cosine similarity between two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    vectors(id_col, vec_col) x queries(query_id_col, vec_col) ->
    (q_id, neighbor_id, cosine, rnk). Queries are broadcast — the big side
    never shuffles."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    q = queries.select(
        F.col(query_id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        "q_id",
        "neighbor_id",
        cosine_sim(F.col("_q"), F.col("_v")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def srp_signatures(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Signed-random-projection bucket keys: one row per (id, table,
    bucket). Hyperplanes are derived deterministically from the seed inside
    each task (no broadcast needed)."""

    def kernel(batches):
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables * n_bits, dim)).astype(np.float64)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # (batch, dim)
            signs = (mat @ planes.T) > 0  # (batch, n_tables*n_bits)
            signs = signs.reshape(len(pdf), n_tables, n_bits)
            buckets = (signs * weights).sum(axis=2)  # (batch, n_tables)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            tables = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            yield pd.DataFrame(
                {"vid": ids, "table_id": tables, "bucket": buckets.ravel()}
            )

    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        kernel, f"vid long, table_id int, bucket long"
    )


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP bucket join -> exact cosine re-rank.

    Recall rises with n_tables (union of candidates across tables) and
    falls with n_bits (finer buckets, fewer candidates). The bucket join
    shuffles on (table_id, bucket) — the A1-style collision prefilter of
    the dedup cascade, reused for vectors."""
    v_sig = srp_signatures(vectors, dim, n_tables, n_bits, id_col, vec_col, seed)
    q_sig = srp_signatures(queries, dim, n_tables, n_bits, query_id_col, vec_col, seed)

    cand = (
        v_sig.alias("v")
        .join(q_sig.alias("q"), ["table_id", "bucket"])
        .select(
            F.col("q.vid").alias("q_id"),
            F.col("v.vid").alias("neighbor_id"),
        )
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .dropDuplicates(["q_id", "neighbor_id"])
    )

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    q = queries.select(
        F.col(query_id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
    )
    scored = (
        cand.join(v, "neighbor_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "neighbor_id", cosine_sim(F.col("_q"), F.col("_v")).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _probe_cells(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """array<int> of the ``nprobe`` nearest centroid cells for one vector
    column, cosine-ranked (ties -> smaller cell id) — a PURE projection:
    the centroid table rides into the plan as a literal array (tiny by
    definition — a coarse quantizer is broadcastable or it is not a coarse
    quantizer), so cell assignment costs ZERO shuffle on the corpus side."""
    scored = F.array(
        *[
            F.struct(
                (-cosine_sim(vec, F.array(*[F.lit(float(x)) for x in cv]))).alias("ncs"),
                F.lit(cell).alias("cell"),
            )
            for cell, cv in enumerate(centroids)
        ]
    )
    ranked = F.array_sort(scored)  # struct order: ncs asc = cosine desc, then cell asc
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])


def ivf_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer: the ``n_cells`` smallest-id vectors,
    in id order (cell i = i-th smallest id). Deterministic and
    SQL-expressible — the oracle-able quantizer for the driver harness; for
    production quality swap in :func:`ivf_centroids_kmeans` (same contract:
    a small ordered list of centroid vectors)."""
    rows = (
        vectors.select(F.col(id_col).alias("_i"), F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy("_i")
        .limit(n_cells)
        .collect()
    )
    return [list(r["_v"]) for r in rows]


def ivf_centroids_kmeans(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 100_000,
) -> list[list[float]]:
    """Production quantizer: k-means|| (Spark ML) over a bounded RANDOM
    sample — at 100 TB the quantizer trains on a sample, never the corpus.
    The sample must be uniform, not ``limit()``: limit takes the first N
    rows in file order, and a corpus written shard-by-shard (by source, by
    time) would train centroids on one region of embedding space, piling
    everything else into a few far cells and collapsing nprobe recall.
    A seeded Bernoulli sample costs one extra count() over the (narrow)
    vector column. Returns the same ordered-centroid-list contract as
    :func:`ivf_centroids`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = vectors.count()
    frac = min(1.0, sample_rows / max(n, 1))
    src = vectors if frac >= 1.0 else vectors.sample(fraction=frac, seed=seed)
    sample = src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(sample)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_assign_kernel(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """(id, cells array<int>[, _v array<double>]) via one numpy matmul per
    Arrow batch — the kernel form of :func:`_probe_cells` for LARGE cell
    counts, where n_cells literal fold-expressions would bloat codegen (the
    native projection is linear in n_cells per row; the matmul is one BLAS
    call). Same argmax-of-cosine semantics, ties -> smaller cell.
    ``keep_vec`` passes the vector through so downstream re-rank needs no
    join back to the source table (mapInPandas is a narrow transform — the
    corpus side still never shuffles)."""
    cmat = np.asarray(centroids, dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cs = nmat @ cmat.T  # (batch, n_cells)
            # stable argsort on -cs: cosine desc, ties -> smaller cell
            top = np.argsort(-cs, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
            out = {"vid": pdf[id_col].to_numpy(), "cells": list(top)}
            if keep_vec:
                out["_v"] = list(mat)
            yield pd.DataFrame(out)

    schema = "vid long, cells array<int>" + (", _v array<double>" if keep_vec else "")
    return df.select(F.col(id_col), vec_col).mapInPandas(kernel, schema)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_cells: int = 64,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    centroids: list[list[float]] | None = None,
    assign_via_kernel: bool | None = None,
) -> DataFrame:
    """IVF-partitioned approximate top-k — the inverted-file scale path
    beside the SRP-LSH one (``ann_topk``): every corpus vector is assigned
    to its nearest coarse cell by a zero-shuffle literal-centroid
    projection, each query probes its ``nprobe`` nearest cells, and the
    exact cosine re-rank touches only vectors in probed cells (~nprobe /
    n_cells of the corpus per query instead of all of it). The probe
    attach is a broadcast join on ``cell`` — the corpus side never
    shuffles; only the candidate set (already cut by the cell filter)
    moves for the per-query top-k.

    ``assign_via_kernel`` (default: auto, > 64 cells) switches cell
    assignment from the literal fold-expression projection to the
    matmul kernel (:func:`ivf_assign_kernel`) — identical semantics;
    at production cell counts (256+) the literal expression tree is
    codegen poison while the kernel is one BLAS call per Arrow batch,
    still a narrow (shuffle-free) transform on the corpus side."""
    cents = centroids if centroids is not None else ivf_centroids(vectors, n_cells, id_col, vec_col)
    use_kernel = assign_via_kernel if assign_via_kernel is not None else len(cents) > 64
    if use_kernel:
        v = ivf_assign_kernel(
            vectors, cents, 1, id_col, vec_col, keep_vec=True
        ).select(
            F.col("vid").alias("neighbor_id"),
            F.col("cells")[0].alias("cell"),
            "_v",
        )
        q = ivf_assign_kernel(
            queries, cents, nprobe, query_id_col, vec_col, keep_vec=True
        ).select(
            F.col("vid").alias("q_id"),
            F.explode("cells").alias("cell"),
            F.col("_v").alias("_q"),
        )
    else:
        v = vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).withColumn("cell", _probe_cells(F.col("_v"), cents, 1)[0])
        q = (
            queries.select(
                F.col(query_id_col).alias("q_id"),
                F.col(vec_col).cast("array<double>").alias("_q"),
            )
            .withColumn("cell", F.explode(_probe_cells(F.col("_q"), cents, nprobe)))
        )
    scored = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", cosine_sim(F.col("_q"), F.col("_v")).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def embedding_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_tables: int = 8,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold) —
    the semantic-dedup edge source, LSH-bucketed so it never goes O(N^2)."""
    sig = srp_signatures(vectors, dim, n_tables, n_bits, id_col, vec_col, seed)
    cand = (
        sig.alias("l")
        .join(sig.alias("r"), ["table_id", "bucket"])
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    v = vectors.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    return (
        cand.join(v.select(F.col(id_col).alias("a"), F.col("_v").alias("_va")), "a")
        .join(v.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb")), "b")
        .select("a", "b", cosine_sim(F.col("_va"), F.col("_vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
