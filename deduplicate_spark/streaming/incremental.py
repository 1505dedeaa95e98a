"""Incremental / streaming dedup ingestion.

The reference has no streaming (SURVEY.md §2.9) — its incrementality is
memoized analysis DBs + recompute-only-NULL-signatures. The batch analog
lives in sources/checkpoint.py. This module adds the Structured Streaming
ingestion surface a production transcript pipeline needs: micro-batch
arrivals are deduped *against the accumulated signature state* without
recomputing history.

Design (foreachBatch — the exactly-once composition pattern):
  * stream of turn rows -> per-batch assembly (a batch carries whole
    conversations; cross-batch conversations are out of scope for v1 and
    flagged via metrics)
  * new docs' exact_sha checked against the persisted docs table (left-anti
    = genuinely new content; matches = instant dupes — the reference's
    "existing analysis" fast path, dupe_analysis.py:106-113)
  * new signatures appended to the signature store; LSH pairs computed
    **only between new docs and (new + old) docs**, never old x old — the
    incremental property that makes 10^12-turn continuous ingestion viable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.operators.assembly import assemble_docs
from deduplicate_spark.operators.lsh import band_buckets
from deduplicate_spark.operators.minhash import compute_signatures
from deduplicate_spark.operators.simhash import confirm_pairs


@dataclass
class IncrementalState:
    """Persisted table paths for the accumulated state."""

    docs_path: str
    signatures_path: str
    pairs_path: str


def process_batch(
    spark: SparkSession,
    turns_batch: DataFrame,
    state: IncrementalState,
    config: DedupConfig | None = None,
    first_batch: bool = False,
) -> dict[str, int]:
    """Process one micro-batch of turns against accumulated state.

    Returns batch metrics. Usable directly or inside
    ``writeStream.foreachBatch(lambda df, _: process_batch(spark, df, st))``.
    """
    config = config or DedupConfig()
    new_docs = assemble_docs(turns_batch, config)

    if first_batch:
        old_docs = None
        old_sigs = None
    else:
        old_docs = spark.read.parquet(state.docs_path)
        old_sigs = spark.read.parquet(state.signatures_path)

    # exact fast path: content already known -> instant dup edge, no kernel
    if old_docs is not None:
        known = old_docs.select("exact_sha").distinct()
        genuinely_new = new_docs.join(known, "exact_sha", "left_anti")
        instant_dupes = new_docs.join(known, "exact_sha", "left_semi")
        n_instant = instant_dupes.count()
    else:
        genuinely_new = new_docs
        n_instant = 0

    # expensive kernel only on genuinely-new content (F2 null-filter analog)
    new_sigs = compute_signatures(genuinely_new.filter(F.col("total_len") > 0), config)
    new_sigs = new_sigs.localCheckpoint(eager=True)

    # incremental LSH: new x (new + old) via band buckets; old x old excluded
    new_buckets = band_buckets(new_sigs, config).withColumn("is_new", F.lit(True))
    if old_sigs is not None:
        old_buckets = band_buckets(old_sigs, config).withColumn("is_new", F.lit(False))
        all_buckets = new_buckets.unionByName(old_buckets)
    else:
        all_buckets = new_buckets

    l = all_buckets.alias("l")
    r = all_buckets.alias("r")
    cand = (
        l.join(r, ["band_id", "band_hash"])
        .filter(F.col("l.conv_id") < F.col("r.conv_id"))
        .filter(F.col("l.is_new") | F.col("r.is_new"))  # never old x old
        .select(
            F.col("l.conv_id").alias("a"),
            F.col("r.conv_id").alias("b"),
            F.lit("lsh").alias("evidence"),
        )
        .dropDuplicates(["a", "b"])
    )

    all_sigs = (
        new_sigs if old_sigs is None else old_sigs.unionByName(new_sigs)
    )
    confirmed = confirm_pairs(cand, all_sigs, config=config).select("a", "b", "evidence")

    # append state
    mode = "overwrite" if first_batch else "append"
    new_docs.write.mode(mode).parquet(state.docs_path)
    new_sigs.write.mode(mode).parquet(state.signatures_path)
    confirmed.write.mode(mode).parquet(state.pairs_path)

    return {
        "batch_docs": new_docs.count(),
        "instant_exact_dupes": n_instant,
        "new_signatures": new_sigs.count(),
        "new_pairs": confirmed.count(),
    }


def stream_turns(
    spark: SparkSession,
    source_path: str,
    state: IncrementalState,
    config: DedupConfig | None = None,
    checkpoint_location: str | None = None,
):
    """Structured Streaming wrapper: watch a parquet directory of turn files
    and fold each micro-batch into the dedup state via foreachBatch."""
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    config = config or DedupConfig()
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_path)
    )

    seen = {"first": True}

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        process_batch(spark, batch_df, state, config, first_batch=seen["first"])
        seen["first"] = False

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()
