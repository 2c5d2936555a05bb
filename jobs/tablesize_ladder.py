"""Table-size dependence ladder — extends BENCH_TABLESIZE.json with a CDC
replay point at ``--mult`` x the standard bench feed (2M convs / ~35M events).

Why this exists: the 10^10-event design-point extrapolation assumes per-event
cost is flat (or falls) as feed and table grow — fixed per-epoch driver cost
amortizes, per-bucket Arrow merges stay O(bucket). Each ladder point is a
direct measurement of that assumption at a bigger size. Protocol matches
bench.py: tmpfs workdirs, best-of-N adaptive trials, host-bandwidth probe
recorded with the point (BASELINE.md noise notes).

Usage:  python jobs/tablesize_ladder.py --mult 10 [--epochs 3] [--label ...]
Writes: merges the point into BENCH_TABLESIZE.json (repo root).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, required=True,
                    help="feed-size multiplier vs the standard 2M-conv feed")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    os.environ.setdefault("SPARK_LOCAL_DIRS",
                          f"{base}/dsx-ladder-local-{os.getpid()}")
    os.environ["DSX_BENCH_TRIALS"] = str(args.trials)

    from bench import host_probe, run_cdc_bench  # noqa: E402 (after env setup)
    from datax_spark.session import get_spark  # noqa: E402

    # speculation: at 10x feed sizes a rare hung executor task (observed
    # once: 63/64 generation tasks done, straggler at 0% CPU for 15+ min,
    # Python worker idle in socket wait) stalls the whole run — a
    # re-launched speculative copy finishes the stage, exactly as on a
    # real cluster
    spark = get_spark(app_name="datax-tablesize-ladder", extra_conf={
        "spark.speculation": "true",
        "spark.speculation.interval": "5s",
        "spark.speculation.multiplier": "4",
        "spark.speculation.quantile": "0.9",
    })
    workdir = f"{base}/dsx-ladder-{os.getpid()}"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    try:
        probe_pre = host_probe()
        point = run_cdc_bench(spark, workdir, 2_000_000 * args.mult, args.epochs)
        point["label"] = args.label or f"{args.mult}x feed"
        point["host_bw_gbps_4proc"] = {"pre": probe_pre, "post": host_probe()}
        path = os.path.join(REPO, "BENCH_TABLESIZE.json")
        doc = json.load(open(path)) if os.path.exists(path) else {
            "metric": "sustained MERGE-apply events/sec vs feed size "
                      "(local[32], tmpfs, best-of-N)",
            "points": [],
        }
        doc["points"] = [p for p in doc["points"]
                         if p.get("label") != point["label"]] + [point]
        doc["points"].sort(key=lambda p: p["events"])
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        print(json.dumps(point))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
