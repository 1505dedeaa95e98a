"""Re-measure ONE scaling cell — a single (minhash_mode, cores) pipeline run
over the cached 26M-turn corpus — bracketed by host probes, appended to
BENCH/scaling_runs.jsonl as a ``record_type: "cell"`` row.

Why this exists: the full 2v8 both-modes campaign (bench/scaling.py) costs
~103 minutes, and this host's I/O degradations arrive mid-hour
(BENCH/BASELINE.md "host pathology") — a campaign routinely loses exactly one
cell to a bad window while the other three are fine. Re-running everything to
fix one cell wastes the three good measurements; this script re-buys just the
lost cell, with the same warmup protocol (run_once is imported, not copied).

    python bench/run_cell.py --cores 8 --minhash-mode oph [--wait-healthy 30]

--wait-healthy N polls bench/host_probe.py every ~2 min for up to N minutes
and only starts the timed run once the probe reports healthy; the row records
both the pre and post probe either way, so a window that turns bad DURING the
run is still visible in the evidence.

Scale note: cells measured this way feed hand-pooled efficiency rows in
BENCH/BASELINE.md, which must cite the per-cell probe health — a pooled
best-of row is weaker evidence than a single-campaign row and is labeled so.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(BENCH_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, BENCH_DIR)

from host_probe import probe  # noqa: E402  (bench/ dir import; see scaling.py)
from scaling import run_once  # noqa: E402


def probe_now() -> dict:
    try:
        p = probe()
        return {
            "copy_gbps": p["resident_copy_gbps"],
            "fresh_fill_s": p["fresh_fill_128mib_s"],
            "healthy": p["healthy"],
        }
    except Exception as e:  # record WHY, never a silent null
        return {"error": f"{type(e).__name__}: {e}"}


def parquet_rows(path: str) -> int:
    """Row count from parquet footers only — no Spark session needed."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--minhash-mode", default="oph", choices=("perm", "oph"))
    ap.add_argument("--input-cache", default="/tmp/scaling_turns.parquet")
    ap.add_argument("--wait-healthy", type=int, default=0, metavar="MINUTES",
                    help="poll the host probe up to this many minutes and "
                         "start only once it reports healthy (0 = start now)")
    args = ap.parse_args()

    n_turns = parquet_rows(args.input_cache)
    pre = probe_now()
    deadline = time.time() + args.wait_healthy * 60
    while args.wait_healthy and not pre.get("healthy") and time.time() < deadline:
        print(f"window unhealthy ({pre}), re-probing in 120s", flush=True)
        time.sleep(120)
        pre = probe_now()

    t0 = datetime.datetime.now(datetime.timezone.utc)
    wall = run_once(args.cores, args.input_cache, minhash_mode=args.minhash_mode)
    row = {
        "record_type": "cell",
        "n_turns": n_turns,
        "cores": args.cores,
        "minhash_mode": args.minhash_mode,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "probes": {"pre": pre, "post": probe_now()},
        "started_utc": t0.isoformat(timespec="seconds"),
    }
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
