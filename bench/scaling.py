"""Scaling-efficiency evidence: same job + same input at two parallelism
levels (local[8] vs local[32]) — the sandbox proxy for N vs 4N executors
required by BASELINE.md. Writes BENCH/BASELINE.md.

    python bench/scaling.py [--replicate 8] [--sf-dir /root/testdata/sf0.1]

Efficiency = (throughput@32 / throughput@8) / (32/8). The input is
materialized to parquet once so both runs read identical bytes; each run
uses shuffle partitions == cores (the setting a real cluster would use).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def materialize_input(sf_dir: str, replicate: int, out_path: str) -> int:
    from deduplicate_spark.entry_queries import docs_as_multiturn_transcripts
    from deduplicate_spark.session import get_spark

    spark = get_spark("scaling_prep", master="local[32]", shuffle_partitions=32)
    # mutate=True: replicas are unique near-dup variants, so the MinHash
    # kernel runs on every doc — a compute-bound load that actually scales
    # (exact replicas would be deduped before the kernel by the cascade)
    turns = docs_as_multiturn_transcripts(
        spark, sf_dir, replicate=replicate, mutate=True
    )
    turns.repartition(64).write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    spark.stop()
    return n


BUCKETS = 64
TURNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def materialize_input_bucketed(sf_dir: str, replicate: int, wh_dir: str) -> int:
    """Materialize the corpus as a conv_id-BUCKETED table — the production
    Iceberg layout of a transcript store (bucket-partitioned on the
    conversation key). Assembly's groupBy(conv_id) then needs NO exchange
    at all: the biggest bandwidth-bound phase (shuffling every text byte)
    disappears at the layout level, which is how a 100 TB deployment
    should run this pipeline."""
    from deduplicate_spark.entry_queries import docs_as_multiturn_transcripts
    from deduplicate_spark.session import get_spark

    spark = get_spark(
        "scaling_prep",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.warehouse.dir": wh_dir},
    )
    turns = docs_as_multiturn_transcripts(spark, sf_dir, replicate=replicate, mutate=True)
    # a fresh session's in-memory catalog doesn't know a prior run's table,
    # so DROP TABLE alone leaves the files -> LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS turns_bucketed")
    import shutil

    shutil.rmtree(os.path.join(wh_dir, "turns_bucketed"), ignore_errors=True)
    (
        turns.write.mode("overwrite")
        .bucketBy(BUCKETS, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .saveAsTable("turns_bucketed")
    )
    n = spark.table("turns_bucketed").count()
    spark.stop()
    return n


def read_bucketed(spark, wh_dir: str):
    """Re-register the bucketed table in a fresh session's catalog (the
    in-memory catalog dies with the session; the bucketed FILES don't)."""
    loc = os.path.join(wh_dir, "turns_bucketed")
    spark.sql("DROP TABLE IF EXISTS turns_bucketed")
    spark.sql(
        f"CREATE TABLE turns_bucketed ({TURNS_DDL}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) "
        f"INTO {BUCKETS} BUCKETS LOCATION '{loc}'"
    )
    return spark.table("turns_bucketed")


def run_once(cores: int, input_path: str, wh_dir: str | None = None,
             minhash_mode: str = "oph") -> float:
    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.pipeline import run_pipeline
    from deduplicate_spark.session import get_spark

    extra = {"spark.sql.warehouse.dir": wh_dir} if wh_dir else None
    spark = get_spark(
        f"scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=extra,
    )
    turns = read_bucketed(spark, wh_dir) if wh_dir else spark.read.parquet(input_path)
    turns.count()  # warm the file listing / page cache uniformly
    # untimed session warmup, same protocol as bench.py: the first
    # mapInPandas forks the Python workers and the first run of each plan
    # shape pays whole-stage codegen — one-time per-SESSION costs, not
    # pipeline throughput; on a real cluster they amortize over the job.
    # Both parallelism levels get the identical warmup. Pin the knobs the
    # timed run will RESOLVE at this corpus size (forced SMJ + rescue
    # short-circuit resolve big, the kernel-parallelism floor resolves
    # OFF) so warmup compiles the same plan shapes the timed run executes.
    run_pipeline(
        spark,
        turns.limit(800),
        DedupConfig(forced_smj=True, rescue_short_circuit=True,
                    kernel_small_corpus=False, minhash_mode=minhash_mode),
    ).actions.count()
    t0 = time.time()
    res = run_pipeline(spark, turns, DedupConfig(minhash_mode=minhash_mode))
    res.actions.count()
    wall = time.time() - t0
    spark.stop()
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--input-cache", default="/tmp/scaling_turns.parquet")
    ap.add_argument("--skip-materialize", action="store_true",
                    help="reuse --input-cache from a prior materialization")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--minhash-mode", default="oph", choices=("perm", "oph", "both"),
                    help="signature estimator for the timed pipeline runs; "
                         "'both' interleaves oph and perm ADJACENTLY at each "
                         "core count within every round — the same-window "
                         "A/B protocol (r5 lesson: estimator comparisons "
                         "across windows are meaningless on this host)")
    ap.add_argument("--bucketed", action="store_true",
                    help="materialize + read the corpus as a conv_id-bucketed "
                         "table (production Iceberg layout): assembly needs no "
                         "text exchange")
    ap.add_argument("--warehouse", default="/tmp/scaling_warehouse")
    ap.add_argument("--write-md", action="store_true",
                    help="overwrite BENCH/BASELINE.md with this run's template "
                         "(default off: BASELINE.md is curated by hand; every "
                         "run always appends to BENCH/scaling_runs.jsonl)")
    args = ap.parse_args()

    if args.bucketed:
        loc = os.path.join(args.warehouse, "turns_bucketed")
        if args.skip_materialize and os.path.exists(loc):
            from deduplicate_spark.session import get_spark

            spark = get_spark("count_only", master="local[8]",
                              extra_conf={"spark.sql.warehouse.dir": args.warehouse})
            n_turns = read_bucketed(spark, args.warehouse).count()
            spark.stop()
        else:
            n_turns = materialize_input_bucketed(args.sf_dir, args.replicate, args.warehouse)
    elif args.skip_materialize and os.path.exists(args.input_cache):
        from deduplicate_spark.session import get_spark

        spark = get_spark("count_only", master="local[8]")
        n_turns = spark.read.parquet(args.input_cache).count()
        spark.stop()
    else:
        n_turns = materialize_input(args.sf_dir, args.replicate, args.input_cache)

    # interleave to cancel thermal/cache drift; keep the best per level.
    # With --minhash-mode both, the two estimators run back-to-back at each
    # core count so every oph-vs-perm comparison shares one window. Each
    # timed run is bracketed by a host probe (VERDICT r5 #3): wall numbers
    # carry their window quality into the JSONL record.
    def probe_now() -> dict | None:
        try:
            # plain module import: this script's own directory (bench/) is on
            # sys.path; `bench.host_probe` would hit the repo-root bench.py
            # module shadow instead.
            from host_probe import probe

            p = probe()
            return {
                "copy_gbps": p["resident_copy_gbps"],
                "fresh_fill_s": p["fresh_fill_128mib_s"],
                "healthy": p["healthy"],
            }
        except Exception as e:  # record WHY, not a bare null (a silent
            # None is indistinguishable from "probe never ran")
            return {"error": f"{type(e).__name__}: {e}"}

    wh = args.warehouse if args.bucketed else None
    modes = ["oph", "perm"] if args.minhash_mode == "both" else [args.minhash_mode]
    walls: dict[tuple[str, int], list[float]] = {
        (m, c): [] for m in modes for c in (args.low, args.high)
    }
    probes: dict[tuple[str, int], list] = {k: [] for k in walls}
    for _ in range(args.rounds):
        for cores in (args.low, args.high):
            for mode in modes:
                pre = probe_now()
                walls[(mode, cores)].append(
                    run_once(cores, args.input_cache, wh_dir=wh, minhash_mode=mode)
                )
                # true bracket: the post probe catches a window that went
                # bad DURING the run (the pre probe alone can't — this
                # host's degradations arrive mid-hour, BENCH/BASELINE.md
                # "host pathology")
                probes[(mode, cores)].append({"pre": pre, "post": probe_now()})

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    results = []
    for mode in modes:
        t_low = min(walls[(mode, args.low)])
        t_high = min(walls[(mode, args.high)])
        thr_low = n_turns / t_low
        thr_high = n_turns / t_high
        efficiency = (thr_high / thr_low) / (args.high / args.low)
        result = {
            "n_turns": n_turns,
            "replicate": args.replicate,
            "sf_dir": args.sf_dir,
            f"wall_sec_local{args.low}": round(t_low, 2),
            f"wall_sec_local{args.high}": round(t_high, 2),
            f"turns_per_sec_local{args.low}": round(thr_low, 1),
            f"turns_per_sec_local{args.high}": round(thr_high, 1),
            "speedup": round(thr_high / thr_low, 3),
            "scaling_efficiency": round(efficiency, 3),
            "all_walls": {
                str(c): [round(x, 2) for x in walls[(mode, c)]]
                for c in (args.low, args.high)
            },
            "probes": {
                str(c): probes[(mode, c)] for c in (args.low, args.high)
            },
            "bucketed_input": args.bucketed,
            "minhash_mode": mode,
            "interleaved_with": [m for m in modes if m != mode] or None,
            "warmup_excluded": True,
        }
        results.append(result)
        print(json.dumps(result))
        with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as fh:
            fh.write(json.dumps(result) + "\n")

    if not args.write_md:
        return
    # markdown template uses the FIRST mode's numbers
    t_low = min(walls[(modes[0], args.low)])
    t_high = min(walls[(modes[0], args.high)])
    thr_low = n_turns / t_low
    thr_high = n_turns / t_high
    efficiency = (thr_high / thr_low) / (args.high / args.low)
    result = results[0]

    md = f"""# BENCH/BASELINE — measured numbers

Scaling evidence (BASELINE.md contract: same job + same input at two
parallelism levels; sandbox proxy for N vs 4N executors).

Job: full dedup pipeline (assembly -> exact cascade -> MinHash -> LSH ->
SimHash confirm -> connected components -> actions) over
{n_turns:,} turns ({args.replicate}x-replicated sf0.1 documents corpus,
planted exact duplicates via replication).

| parallelism | wall (s) | throughput (turns/s) |
|---|---|---|
| local[{args.low}] (N) | {t_low:.2f} | {thr_low:,.0f} |
| local[{args.high}] (4N) | {t_high:.2f} | {thr_high:,.0f} |

**speedup {args.low}->{args.high} cores: {thr_high / thr_low:.2f}x;
scaling efficiency: {efficiency:.3f}** (target >= 0.8)

Runs interleaved 2x per level, best wall kept; shuffle partitions == cores;
input pre-materialized to parquet and page-cache-warmed before timing.
Raw walls: {result["all_walls"]}
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
