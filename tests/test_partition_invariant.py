"""Partition-size invariant (VERDICT r5 #2): checkpointed stage partition
counts must track DATA BYTES, not the parallelism-derived shuffle partition
count. At local[2] on a 26M-turn corpus the assembly shuffle used to emit two
~6 GiB partitions; caching those blocks plus one concurrent sort-page request
aborted with UNABLE_TO_ACQUIRE_MEMORY ~1 run in 7 (BENCH/BASELINE.md r5).

The fix is session-level: AQE starts every shuffle at
``initialPartitionNum=256`` and coalesces by measured bytes (>= 1 MB
minPartitionSize, parallelism-first), so no exchange can produce
partitions sized corpus/cores. These tests pin that contract at a scaled-down
ratio: shuffle_partitions=2 with a multi-MB corpus must yield MORE than 2
post-AQE partitions for the checkpointed docs table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.lineage import cut_lineage
from deduplicate_spark.operators.assembly import assemble_docs


@pytest.fixture()
def low_core_conf(spark):
    """Temporarily mimic the local[2] scaling-harness layout: 2 shuffle
    partitions. The AQE byte-coalescing confs come from session.get_spark
    (the shipped defaults) — that is exactly what's under test."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _fat_turns(spark, n_convs: int = 64, turn_kb: int = 128):
    """~n_convs * turn_kb KiB of INCOMPRESSIBLE text (default ~8 MiB) —
    AQE's coalesce decision reads compressed shuffle-map bytes, so a
    constant payload would shrink ~1000x under lz4 and defeat the test;
    pseudorandom hex (~2x like real text) keeps the measured bytes real."""
    import hashlib

    import pandas as pd

    rows = []
    for i in range(n_convs):
        chunks = []
        seed = f"conv-{i}".encode()
        for j in range(turn_kb * 1024 // 64):
            seed = hashlib.sha256(seed + str(j).encode()).digest()
            chunks.append(seed.hex())
        rows.append(
            {
                "conv_id": f"conv-{i}",
                "turn_idx": 0,
                "role": "user",
                "text": "".join(chunks),
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
            }
        )
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    return spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)


def test_session_defaults_pin_byte_coalescing(spark):
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        == "256"
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_docs_checkpoint_partitions_scale_with_bytes(low_core_conf):
    spark = low_core_conf
    turns = _fat_turns(spark)
    docs = cut_lineage(assemble_docs(turns, DedupConfig()), eager=True)
    n_parts = docs.rdd.getNumPartitions()
    # 8 MiB of doc_text across 2 shuffle partitions would be ~4 MiB each;
    # byte-derived coalescing (min 1 MB) must keep strictly more than the
    # parallelism-derived count. (At the real failure scale the same math
    # turns two 6 GiB partitions into ~48-128 MB ones.)
    assert n_parts > 2, f"docs checkpoint inherited slot-count layout: {n_parts}"
    # and the data actually made it through assembly intact
    assert docs.count() == 64


def test_small_corpus_not_over_partitioned(low_core_conf):
    """Counter-guard: a tiny corpus must NOT fan out to 256 micro-tasks —
    AQE should coalesce small shuffles back down (parallelism-first, 1 MB
    min), keeping test/driver workloads cheap."""
    spark = low_core_conf
    turns = _fat_turns(spark, n_convs=20, turn_kb=1)  # ~20 KiB total
    docs = cut_lineage(assemble_docs(turns, DedupConfig()), eager=True)
    assert docs.rdd.getNumPartitions() <= 8
    assert docs.count() == 20
