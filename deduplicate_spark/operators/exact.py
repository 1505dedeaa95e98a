"""Stage 1 — exact-duplicate path.

Reproduces the reference's core query shape: collision grouping
``GROUP BY hash HAVING COUNT(*) > 1`` (A1, /root/reference/
dupe_analysis.py:391-407) and the duplicate-group report keyed by hash (A2,
dupe_analysis.py:532-562). Hash equality is transitive, so exact clusters
are just hash groups — no connected components needed (G1).

Cluster id = min(conv_id) within the group (stable, deterministic), instead
of the reference's "cluster id = hash value" — same partition of the rows,
friendlier ids.

Scale notes: group stats are salted partial aggregations (skew.py) — the
key is a sha1 so skew only occurs for genuinely massive duplicate groups
(boilerplate docs, the EMPTY_SHA1 group), which is exactly the case the
salted form + skew-splittable SMJ join-back is built for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicate_spark.operators.skew import tag_bucket_stats


def collision_groups(df: DataFrame, key: str) -> DataFrame:
    """Keys with more than one member — the cascade prefilter (A1).

    ``SELECT {key} FROM t WHERE {key} IS NOT NULL GROUP BY {key}
    HAVING COUNT(*) > 1`` (dupe_analysis.py:391-407).
    """
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
    )


def semi_join_collisions(df: DataFrame, key: str) -> DataFrame:
    """Rows belonging to multi-member groups (J1): the reference's
    ``WHERE {key} IN (subquery)`` semi-join (dupe_analysis.py:395-406).
    Only these rows advance to the next cascade pass."""
    hot = collision_groups(df, key).select(key)
    return df.join(hot, key, "left_semi")


def exact_clusters(
    docs: DataFrame, key: str = "exact_sha", salt_buckets: int = 8
) -> DataFrame:
    """(conv_id, cluster_id) for all members of exact-duplicate groups.

    Rows in singleton groups are dropped (they are unique — reference
    reports only count>1 groups, dupe_analysis.py:545-552). Group count/min
    come from the shared salted partial-agg helper + SMJ join-back, not a
    ``Window.partitionBy(hash)``: a boilerplate exact group with 10^7+
    members would be one window task AQE cannot split, while the join-back
    is skew-splittable.
    """
    tagged = tag_bucket_stats(
        docs.filter(F.col(key).isNotNull()).select("conv_id", key),
        key,
        salt_buckets=salt_buckets,
    )
    return tagged.select("conv_id", F.col("bucket_rep").alias("cluster_id"))


def exact_pairs(docs: DataFrame, key: str = "exact_sha") -> DataFrame:
    """Within-group all-pairs edges (J2 clique construction,
    deduplicate.py:497-528) with ``a < b`` ordering. Used by the recall
    harness; at scale prefer :func:`exact_clusters` (linear output)."""
    hot = collision_groups(docs, key).select(key)
    side = docs.join(hot, key, "left_semi").select(F.col(key), F.col("conv_id"))
    l, r = side.alias("l"), side.alias("r")
    return (
        l.join(r, key)
        .filter(F.col("l.conv_id") < F.col("r.conv_id"))
        .select(
            F.col("l.conv_id").alias("a"),
            F.col("r.conv_id").alias("b"),
            F.lit("exact").alias("evidence"),
        )
    )


def duplicate_group_report(docs: DataFrame, key: str = "exact_sha") -> DataFrame:
    """A2 analog: per-group membership report. The reference GROUP_CONCATs
    paths (dupe_analysis.py:545-552); at scale we emit one row per group with
    count + total reclaimable length, not collected member lists."""
    return (
        docs.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("conv_id").alias("cluster_id"),
            F.sum("total_len").alias("group_len"),
            (F.sum("total_len") - F.max("total_len")).alias("reclaimable_len"),
        )
        .filter(F.col("n_members") > 1)
    )
