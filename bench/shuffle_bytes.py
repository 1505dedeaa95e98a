"""Per-run shuffle/input byte accounting for the dedup pipeline.

Runs the full pipeline on a pre-materialized corpus and reports wall time
plus total bytes through the exchanges (Spark REST API, summed over
completed stages) — the direct evidence for "did the shuffle get
narrower", independent of the host's nondeterministic DRAM bandwidth
(BENCH/BASELINE.md). Used for the internal_long_ids A/B.

    python bench/shuffle_bytes.py --input /tmp/scaling_turns.parquet \
        [--cores 8] [--modes long,str]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4049


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}") as r:
        return json.load(r)


def stage_bytes() -> dict[str, int]:
    app_id = _rest("/applications")[0]["id"]
    stages = _rest(f"/applications/{app_id}/stages?status=complete")
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "n_stages": len(stages),
    }


def top_stages(k: int = 8) -> list[dict]:
    """Top-k completed stages by executor run time — where the wall goes."""
    app_id = _rest("/applications")[0]["id"]
    stages = _rest(f"/applications/{app_id}/stages?status=complete")
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    return [
        {
            "stage": s["stageId"],
            "name": s.get("name", "")[:60],
            "run_ms": s.get("executorRunTime", 0),
            "tasks": s.get("numCompleteTasks", 0),
            "in_mb": round(s.get("inputBytes", 0) / 1e6),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
        }
        for s in stages[:k]
    ]


def run_once(
    cores: int, input_path: str, long_ids: bool, warehouse: str | None = None
) -> dict:
    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.pipeline import run_pipeline
    from deduplicate_spark.session import get_spark

    mode_name = "bucketed" if warehouse else ("long" if long_ids else "str")
    extra = {"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)}
    if warehouse:
        extra["spark.sql.warehouse.dir"] = warehouse
    spark = get_spark(
        f"shufbytes_{mode_name}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=extra,
    )
    if warehouse:
        from bench.scaling import read_bucketed

        turns = read_bucketed(spark, warehouse)
    else:
        turns = spark.read.parquet(input_path)
    turns.count()
    base = stage_bytes()
    t0 = time.time()
    res = run_pipeline(spark, turns, DedupConfig(internal_long_ids=long_ids))
    res.actions.count()
    wall = time.time() - t0
    end = stage_bytes()
    tops = top_stages()
    out = {
        "mode": mode_name,
        "cores": cores,
        "wall_sec": round(wall, 1),
        **{k: end[k] - base.get(k, 0) for k in end},
        "top_stages": tops,
    }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/scaling_turns.parquet")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--modes", default="long,str")
    ap.add_argument("--rounds", type=int, default=1)
    args = ap.parse_args()
    for _ in range(args.rounds):
        for mode in args.modes.split(","):
            print(
                json.dumps(run_once(args.cores, args.input, mode == "long")),
                flush=True,
            )


if __name__ == "__main__":
    main()
