"""Stage 4 — pair confirmation.

The reference confirms cheap-fingerprint collisions with a more expensive
hash before declaring duplicates (rev_hash confirms beg_hash groups,
/root/reference/dupe_analysis.py:367-375; optional full_hash confirmation at
622-633 = ``complete_hash``). Our analog:

  * LSH candidate pairs are confirmed by SimHash Hamming distance <= t —
    computed NATIVELY: ``bit_count(simhash_a ^ simhash_b)``, no UDF.
  * ``complete_hash=True`` escalates confirmation to exact content equality
    (exact_sha match), reproducing the reference's strict mode that its
    test_complete_hash (test_dupe_analysis.py:469-496) pins.

Non-transitivity guard: confirmation before connected components prevents
LSH false positives from chaining unrelated docs into one cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig


def attach_signatures(
    pairs: DataFrame, signatures: DataFrame, with_minhash: bool = False
) -> DataFrame:
    """pairs(a, b) x signatures -> per-side signature columns. Two shuffle
    hash joins on conv_id; Catalyst broadcasts if signatures are small.
    The minhash array (8*num_perm bytes/row) is only carried when needed."""
    cols = ["conv_id", "simhash"] + (["minhash"] if with_minhash else [])
    sig = signatures.select(*cols)

    def side(name: str) -> DataFrame:
        renames = [F.col("conv_id").alias(name), F.col("simhash").alias(f"simhash_{name}")]
        if with_minhash:
            renames.append(F.col("minhash").alias(f"minhash_{name}"))
        return sig.select(*renames)

    return pairs.join(side("a"), "a").join(side("b"), "b")


def confirm_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    docs: DataFrame | None = None,
    config: DedupConfig | None = None,
) -> DataFrame:
    """Candidate (a, b) -> confirmed (a, b, evidence, hamming)."""
    config = config or DedupConfig()

    if config.complete_hash:
        # strict mode: duplicates must be exact-content-equal
        if docs is None:
            raise ValueError("complete_hash=True requires docs for exact_sha")
        sha = docs.select("conv_id", "exact_sha")
        return (
            pairs.join(
                sha.select(F.col("conv_id").alias("a"), F.col("exact_sha").alias("sha_a")), "a"
            )
            .join(
                sha.select(F.col("conv_id").alias("b"), F.col("exact_sha").alias("sha_b")), "b"
            )
            .filter(F.col("sha_a") == F.col("sha_b"))
            .select("a", "b", F.lit("exact").alias("evidence"), F.lit(0).alias("hamming"))
        )

    if not config.confirm_with_simhash and config.min_jaccard is None:
        return pairs.select("a", "b", "evidence").withColumn("hamming", F.lit(None).cast("int"))

    out = attach_signatures(
        pairs, signatures, with_minhash=config.min_jaccard is not None
    ).withColumn(
        "hamming", F.bit_count(F.expr("simhash_a ^ simhash_b")).cast("int")
    )
    if config.confirm_with_simhash:
        out = out.filter(F.col("hamming") <= config.simhash_hamming_max)
    if config.min_jaccard is not None:
        # MinHash Jaccard estimate = fraction of agreeing signature slots —
        # native zip_with/aggregate, stays in codegen
        out = out.withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with(
                    "minhash_a", "minhash_b",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(config.num_perm),
        ).filter(F.col("est_jaccard") >= config.min_jaccard)
    return out.select("a", "b", F.lit("near").alias("evidence"), "hamming")
