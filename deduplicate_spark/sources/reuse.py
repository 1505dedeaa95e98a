"""S7 partial-reuse planner — distributed restatement.

The reference, asked to analyze {A, B, C}, greedily searches prior analysis
DBs for the largest reusable dir-subsets (itertools.combinations largest-
first, /root/reference/dupe_analysis.py:125-157), analyzes only the missing
dirs, then merges (S8, 454-495) and saves the combined DB under the
full-set key (sha1 of the sorted dir set, dupe_analysis.py:38-43).

Two planners:

  * :func:`plan_and_load` — per-batch reuse. Each named batch's stage
    output is checkpointed under its own key; a request recomputes only
    missing batches. Linear cost in the number of batches — the planner
    for thousands of streaming batches.
  * :func:`plan_and_load_subsets` — the FULL reference analog: greedy
    largest-subset combination search over prior multi-batch stores,
    leftover singletons computed individually, merged first-writer-wins,
    and the merged result persisted under the full-set key so the next
    identical request is a pure load. The combination sweep is exponential
    in the key count (exactly like the reference's itertools search over
    CLI dir args), so it is guarded by ``max_subset_search`` and falls
    back to per-batch reuse beyond it — an explicit cap, not a silent one.
"""

from __future__ import annotations

import hashlib
import itertools
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from deduplicate_spark.sources.checkpoint import CheckpointStore, merge_runs


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


MAX_SUBSET_SEARCH = 12  # combination sweep is exponential; beyond this,
# fall back to linear per-batch reuse (documented cap)


def _set_key(keys) -> str:
    """Deterministic key for a batch SET — the reference's
    sha1(sorted dir set) DB path (dupe_analysis.py:38-43)."""
    return "set-" + hashlib.sha1("\x00".join(sorted(keys)).encode()).hexdigest()[:16]


def _single_store(
    spark: SparkSession, root: str, config_hash: str, key: str
) -> CheckpointStore:
    # same layout as plan_and_load, so prior per-batch checkpoints interop
    return CheckpointStore(
        spark=spark, root=f"{root}/{key}", config_hash=config_hash, input_key=key
    )


def _subset_store(
    spark: SparkSession, root: str, config_hash: str, keys
) -> CheckpointStore:
    sk = _set_key(keys)
    return CheckpointStore(
        spark=spark, root=f"{root}/{sk}", config_hash=config_hash, input_key=sk
    )


def plan_and_load_subsets(
    spark: SparkSession,
    root: str,
    config_hash: str,
    stage: str,
    batches: dict[str, "DataFrame | None"],
    compute_fn,
    max_subset_search: int = MAX_SUBSET_SEARCH,
    save_combined: bool = True,
) -> tuple[DataFrame, ReusePlan]:
    """Greedy largest-subset reuse — the full S7 analog
    (dupe_analysis.py:125-157):

    1. full-set store exists -> pure load (the reference's cache hit);
    2. else sweep combinations of the missing keys largest-first; every
       existing subset store found at a size is taken and its keys removed,
       re-scanning at the SAME size until a sweep finds nothing (deliberate
       deviation from the reference loop, which decrements after the first
       hit and so recomputes {C,D} for a {A,B,C,D} request with prior
       {A,B}+{C,D} stores — ADVICE r3; still bounded by max_subset_search);
    3. leftover singletons are reused-or-computed individually;
    4. everything merges first-writer-wins (S8, merge_runs) and the merged
       table is saved under the full-set key for the next request.

    Stage outputs must carry a ``conv_id`` column (the merge key —
    first-writer-wins across overlapping stores, like the reference's
    merged SQLite stores).
    """
    requested = frozenset(batches)
    if not requested:
        raise ValueError("no batches requested")
    plan = ReusePlan(reused=[], computed=[])

    full = _subset_store(spark, root, config_hash, requested)
    if full.is_complete(stage):
        plan.reused.append("+".join(sorted(requested)))
        return full.read(stage), plan

    if len(requested) > max_subset_search:
        return plan_and_load(spark, root, config_hash, stage, batches, compute_fn)

    remaining = set(requested)
    stores: list[CheckpointStore] = []
    size = len(remaining) - 1
    while remaining and size > 0:
        size = min(size, len(remaining))
        found = False
        for comb in itertools.combinations(sorted(remaining), size):
            st = _subset_store(spark, root, config_hash, comb)
            if st.is_complete(stage):
                stores.append(st)
                plan.reused.append("+".join(comb))
                remaining -= set(comb)
                found = True
                break
        if not found:
            size -= 1

    for key in sorted(remaining):
        st = _single_store(spark, root, config_hash, key)
        if st.is_complete(stage):
            plan.reused.append(key)
        else:
            if batches[key] is None:
                raise ValueError(f"batch '{key}' not checkpointed and no input given")
            st.stage(stage, compute_fn(batches[key]))
            plan.computed.append(key)
        stores.append(st)

    merged = (
        stores[0].read(stage)
        if len(stores) == 1
        else merge_runs(spark, stores, stage)
    )
    if save_combined and len(requested) > 1:
        merged = full.stage(stage, merged)
    return merged, plan
