"""Stage 6 — canonical election + actions + cluster report.

The reference resolves duplicates with a greedy multi-pass keep/delete state
machine over a mutable object graph (/root/reference/deduplicate.py:269-344,
576-631): pick the "best" directory, keep its files, delete their clique
peers, repeat. Spark DataFrames are immutable, so we replace mutation with a
single deterministic *election*: one canonical representative per cluster via
a window rank (the O1 mapping in SURVEY.md §2.6) — same outcome class
(exactly one keeper per equivalence class), order-free and parallel.

Election order mirrors the reference's preference for the "largest/most
complete" copy (calc_max sorts by kept/extra/count totals,
deduplicate.py:298-309): more turns first, then longer text, then smallest
conv_id as the deterministic tie-break.

The CSV report analog (S9, deduplicate.py:691-718) becomes the ``actions``
DataFrame; the destructive delete sink (S10) is intentionally NOT an engine
side effect — downstream consumes `action='delete'` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicate_spark.operators.skew import (
    desc_nulls_last_key,
    maybe_merge_hint,
    salted_struct_min,
)


def elect_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    policy: str = "doc",
    salt_buckets: int = 8,
    forced_smj: bool = True,
) -> DataFrame:
    """clusters(conv_id, cluster_id) x docs -> + canonical_conv_id.

    policy='doc'   — rank by (n_turns desc, total_len desc, conv_id asc).
    policy='group' — first prefer the source group (first '/'-segment of
        conv_id) with the most NON-duplicate extras, then the most cluster
        members, then the doc ranking. This reproduces the reference's
        greedy "superset directory" preference: a dir holding the dupes
        PLUS unique extras is kept; its full-dupe mirror is deleted whole
        (calc_max sorts kept_total/extra_total desc,
        deduplicate.py:298-309; is_superset flag 133-178).

    The election order is a lexicographic tuple ending in the unique
    conv_id, so rank-1 is EXACTLY the argmin of an ascending-encoded sort
    struct — computed as a salted algebraic ``min(struct(...))`` partial
    aggregation + SMJ join-back (skew.py) rather than a
    ``row_number() over (partition by cluster_id)`` window, which would put
    a boilerplate mega-cluster in one task AQE cannot split."""
    # docs is corpus-sized: forced SMJ so a planner under-estimate can never
    # build it as a driver-side broadcast (measured OOM class at 6.5M turns)
    ranked = clusters.join(
        maybe_merge_hint(docs.select("conv_id", "n_turns", "total_len"), forced_smj),
        "conv_id",
        "left",
    )
    order_keys = [
        desc_nulls_last_key("n_turns"),
        desc_nulls_last_key("total_len"),
        F.col("conv_id"),
    ]
    if policy == "group":
        grp_of = lambda c: F.split(F.col(c), "/").getItem(0)  # noqa: E731
        all_grp = (
            docs.select(grp_of("conv_id").alias("_grp"))
            .groupBy("_grp")
            .agg(F.count(F.lit(1)).alias("_grp_total"))
        )
        dup_grp = (
            clusters.select(grp_of("conv_id").alias("_grp"))
            .groupBy("_grp")
            .agg(F.count(F.lit(1)).alias("_grp_dups"))
        )
        grp_stats = all_grp.join(dup_grp, "_grp", "left").select(
            "_grp",
            (F.col("_grp_total") - F.coalesce(F.col("_grp_dups"), F.lit(0))).alias(
                "_grp_extras"
            ),
            F.coalesce(F.col("_grp_dups"), F.lit(0)).alias("_grp_dups"),
        )
        ranked = ranked.withColumn("_grp", grp_of("conv_id")).join(
            F.broadcast(grp_stats), "_grp", "left"
        )
        order_keys = [
            desc_nulls_last_key("_grp_extras"),
            desc_nulls_last_key("_grp_dups"),
            *order_keys,
        ]
    ord_struct = F.struct(
        *[k.alias(f"k{i}") for i, k in enumerate(order_keys[:-1])],
        F.col("conv_id").alias("cid"),
    )
    canon = salted_struct_min(
        ranked.select("cluster_id", ord_struct.alias("_ord")),
        "cluster_id",
        salt_buckets=salt_buckets,
    ).select("cluster_id", F.col("_ord.cid").alias("canonical_conv_id"))
    return ranked.join(maybe_merge_hint(canon, forced_smj), "cluster_id").select(
        "conv_id", "cluster_id", "canonical_conv_id", "n_turns", "total_len"
    )


def actions(
    clusters: DataFrame,
    docs: DataFrame,
    policy: str = "doc",
    forced_smj: bool = True,
) -> DataFrame:
    """(conv_id, cluster_id, canonical_conv_id, action, freed_len) — the
    keep-one-delete-rest recommendation (G2 state machine, derived not
    mutated)."""
    elected = elect_canonical(clusters, docs, policy=policy, forced_smj=forced_smj)
    return elected.select(
        "conv_id",
        "cluster_id",
        "canonical_conv_id",
        F.when(F.col("conv_id") == F.col("canonical_conv_id"), F.lit("keep"))
        .otherwise(F.lit("delete"))
        .alias("action"),
        F.when(F.col("conv_id") == F.col("canonical_conv_id"), F.lit(0))
        .otherwise(F.coalesce(F.col("total_len"), F.lit(0)))
        .cast("long")
        .alias("freed_len"),
    )


def cluster_report(actions_df: DataFrame) -> DataFrame:
    """Report compaction (G5 analog, deduplicate.py:641-676): one row per
    cluster with member/delete counts and reclaimable length — the
    dupe_list.csv summary, grouped."""
    return (
        actions_df.groupBy("cluster_id", "canonical_conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.when(F.col("action") == "delete", 1).otherwise(0)).alias("n_deletes"),
            F.sum("freed_len").alias("reclaimable_len"),
        )
        .orderBy("cluster_id")
    )
