"""spark-submit entry point for the dedup pipeline.

    spark-submit --py-files dist/deduplicate_spark.zip jobs/dedup.py \
        --input  /path/to/transcripts_parquet_or_iceberg_table \
        --output /path/to/output_root \
        --checkpoint-root /path/to/ckpt \
        [--resume] [--substring] [--complete-hash] \
        [--exclude-roles system] [--shingle-k 9] [--num-perm 128] \
        [--bands 32] [--rows 4] [--hamming-max 12] \
        [--synology] [--analyze] [--manual-store /path/to/prior/ckpt]

Reads the transcripts table (parquet path or, when an Iceberg catalog is
configured on the cluster, a table identifier), runs the full cascade, and
writes clusters/, actions/, report/ under --output. With --checkpoint-root
every stage is materialized + resumable; rerunning with --resume skips
completed stages (lineage keyed by config hash + input fingerprint).

The CLI surface mirrors the reference driver
(/root/reference/deduplicate.py:731-746: --delete/--analyze/--synology) in
spirit: analysis always writes the action table; the destructive delete is
left to downstream (S10 is not an engine side effect).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

# plain `python jobs/dedup.py` runs put jobs/ (not the repo root) on
# sys.path; spark-submit --py-files covers executors but not a local
# driver launched outside the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark near-duplicate detection pipeline")
    p.add_argument("--input", required=True, help="transcripts parquet path or table id")
    p.add_argument("--output", required=True, help="output root directory")
    p.add_argument("--checkpoint-root", default=None)
    p.add_argument("--resume", action="store_true", help="reuse completed stages")
    p.add_argument("--substring", action="store_true", help="enable substring pass")
    p.add_argument("--complete-hash", action="store_true", help="exact-only confirmation")
    p.add_argument("--exclude-roles", nargs="*", default=[])
    p.add_argument("--exclude-conv-regex", default=None)
    p.add_argument(
        "--synology",
        action="store_true",
        help="preset: exclude conv_ids with a path segment starting with "
        "'@' or '.' (reference --synology globs '*/@*', '*/.*', "
        "deduplicate.py:452-453)",
    )
    p.add_argument(
        "--analyze",
        action="store_true",
        help="analysis only: write clusters, skip actions/report "
        "(reference --analyze, deduplicate.py:459-461)",
    )
    p.add_argument(
        "--manual-store",
        default=None,
        help="load/write a specific checkpoint store root instead of the "
        "one derived from the input (reference --manual DB, "
        "dupe_analysis.py:99-102); implies --resume",
    )
    p.add_argument("--shingle-k", type=int, default=9)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--hamming-max", type=int, default=12)
    p.add_argument("--min-jaccard", type=float, default=0.7,
                   help="min-Jaccard rescue threshold (DedupConfig default "
                        "0.7); negative disables the rescue — the old CLI "
                        "default of None silently disabled it, diverging "
                        "from library-default runs")
    p.add_argument("--minhash-mode", default="perm", choices=("perm", "oph"),
                   help="signature estimator: classic 128-perm MinHash or "
                        "one-permutation hashing (O(shingles) kernel)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.pipeline import run_pipeline
    from deduplicate_spark.sources.checkpoint import CheckpointStore

    spark = SparkSession.builder.appName("deduplicate_spark_job").getOrCreate()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))

    exclude_conv_regex = args.exclude_conv_regex
    if args.synology:
        # '*/@*' + '*/.*' glob analog on the conv_id path space
        synology_re = r"(^|/)[@.]"
        exclude_conv_regex = (
            synology_re
            if exclude_conv_regex is None
            else f"({exclude_conv_regex})|({synology_re})"
        )

    config = DedupConfig(
        exclude_roles=tuple(args.exclude_roles),
        exclude_conv_regex=exclude_conv_regex,
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        lsh_bands=args.bands,
        lsh_rows=args.rows,
        simhash_hamming_max=args.hamming_max,
        min_jaccard=(None if args.min_jaccard < 0 else args.min_jaccard),
        minhash_mode=args.minhash_mode,
        enable_substring_pass=args.substring,
        complete_hash=args.complete_hash,
    )

    if args.input.endswith((".parquet", "/")) or "/" in args.input:
        turns = spark.read.parquet(args.input)
    else:
        turns = spark.read.table(args.input)

    store = None
    checkpoint_root = args.manual_store or args.checkpoint_root
    resume = args.resume or args.manual_store is not None
    if checkpoint_root:
        input_key = hashlib.sha1(args.input.encode()).hexdigest()[:16]
        store = CheckpointStore(
            spark=spark,
            root=checkpoint_root,
            config_hash=config.config_hash(),
            input_key=input_key,
            enabled=True,
        )
        if not resume:
            for stage in ("docs", "signatures", "pairs", "clusters", "actions"):
                store.invalidate(stage)

    t0 = time.time()
    result = run_pipeline(spark, turns, config, store=store, analyze_only=args.analyze)
    result.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    if not args.analyze:
        result.actions.write.mode("overwrite").parquet(f"{args.output}/actions")
        result.report.write.mode("overwrite").parquet(f"{args.output}/report")
    wall = time.time() - t0

    if store is not None:
        store.write_metrics()

    summary = {
        "wall_sec": round(wall, 2),
        "clusters": result.clusters.select("cluster_id").distinct().count(),
        "config_hash": config.config_hash(),
        "analyze_only": bool(args.analyze),
    }
    if not args.analyze:
        summary["actions"] = result.actions.count()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
