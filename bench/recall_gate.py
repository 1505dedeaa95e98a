"""Recall gate: Spark pipeline vs the pure-Python reference-semantics oracle
at the same config on a fresh planted-duplicate corpus.

    python bench/recall_gate.py [--n-base 2000] [--seed 99]

Prints one JSON line and appends the measured numbers to BENCH/RECALL.md.
Gate (BASELINE.md): dup-pair recall >= 0.99 in BOTH directions (found vs
oracle, oracle vs found) plus per-kind planted recall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--minhash-mode",
        choices=("perm", "oph"),
        default="perm",
        help="signature kernel under test; the oracle uses the SAME mode, so "
        "recall_vs_oracle stays a pipeline-vs-semantics check while the "
        "planted per-kind numbers measure the kernel's detection quality",
    )
    args = ap.parse_args()

    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.datagen import generate_transcripts, manifest_df
    from deduplicate_spark.oracle import assemble_docs_pandas, oracle_dup_pairs, pair_recall
    from deduplicate_spark.pipeline import dup_pairs_from_clusters, run_pipeline
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA
    from deduplicate_spark.session import get_spark

    cfg = DedupConfig(
        exclude_roles=("system",),
        enable_substring_pass=True,
        minhash_mode=args.minhash_mode,
    )
    turns_pd, manifest = generate_transcripts(n_base=args.n_base, seed=args.seed)
    mdf = manifest_df(manifest)

    spark = get_spark("recall_gate", master=f"local[{args.cores}]")
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPTS_SCHEMA)
    t0 = time.time()
    res = run_pipeline(spark, turns, cfg)
    found = {(r["a"], r["b"]) for r in dup_pairs_from_clusters(res.clusters).collect()}
    wall = time.time() - t0

    docs_pd = assemble_docs_pandas(turns_pd, cfg)
    oracle = oracle_dup_pairs(docs_pd, cfg)

    planted = {}
    for kind in ("exact", "near", "substring"):
        exp = {
            tuple(sorted([r.conv_a, r.conv_b]))
            for r in mdf[mdf.expected_level == kind].itertuples()
        }
        planted[kind] = {
            "expected": len(exp),
            "recalled": len(exp & found),
            "recall": round(pair_recall(found, exp), 4),
        }

    out = {
        "n_base": args.n_base,
        "n_turns": int(len(turns_pd)),
        "seed": args.seed,
        "pipeline_wall_sec": round(wall, 2),
        "recall_vs_oracle": round(pair_recall(found, oracle), 4),
        "oracle_containment": round(pair_recall(oracle, found), 4),
        "found_pairs": len(found),
        "oracle_pairs": len(oracle),
        "planted": planted,
        "minhash_mode": args.minhash_mode,
        "config_hash": cfg.config_hash(),
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "RECALL.md"), "a") as fh:
        fh.write(
            f"\n- n_base={args.n_base} seed={args.seed} mode={args.minhash_mode}: "
            f"recall_vs_oracle={out['recall_vs_oracle']}, "
            f"oracle_containment={out['oracle_containment']}, "
            f"planted={{exact: {planted['exact']['recall']}, "
            f"near: {planted['near']['recall']}, "
            f"substring: {planted['substring']['recall']}}}, "
            f"wall={out['pipeline_wall_sec']}s\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
