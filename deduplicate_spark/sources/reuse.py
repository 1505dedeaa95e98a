"""S7 partial-reuse planner — distributed restatement.

The reference, asked to analyze {A, B, C}, greedily searches prior analysis
DBs for the largest reusable dir-subsets (itertools.combinations largest-
first, /root/reference/dupe_analysis.py:125-157), analyzes only the missing
dirs, then merges (S8, 454-495).

Distributed analog: work arrives as named input batches; each batch's stage
output is checkpointed under its own key. The planner partitions a request
into (reusable batches, missing batches), computes only the missing ones,
and unions everything — set-cover degenerates to per-batch reuse because
stage outputs are row-disjoint by construction (per-batch), which the
reference's overlapping SQLite stores were not.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from deduplicate_spark.sources.checkpoint import CheckpointStore


@dataclass
class ReusePlan:
    reused: list[str]
    computed: list[str]


def plan_and_load(
    spark: SparkSession,
    root: str,
    config_hash: str,
    stage: str,
    batches: dict[str, "DataFrame | None"],
    compute_fn,
) -> tuple[DataFrame, ReusePlan]:
    """For each named batch: reuse its checkpointed ``stage`` output if the
    lineage matches, else run ``compute_fn(batch_df)`` and checkpoint it.
    Returns (union of all batch outputs, plan).

    ``batches`` maps batch_key -> input DataFrame (None allowed when the
    caller knows the batch is already checkpointed — pure reuse)."""
    outputs: list[DataFrame] = []
    plan = ReusePlan(reused=[], computed=[])
    for key, df in sorted(batches.items()):
        store = CheckpointStore(
            spark=spark, root=f"{root}/{key}", config_hash=config_hash, input_key=key
        )
        if store.is_complete(stage):
            outputs.append(store.read(stage))
            plan.reused.append(key)
        else:
            if df is None:
                raise ValueError(f"batch '{key}' not checkpointed and no input given")
            outputs.append(store.stage(stage, compute_fn(df)))
            plan.computed.append(key)
    merged = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), outputs)
    return merged, plan
