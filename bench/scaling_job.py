"""Child job for scaling evidence: one full CDC ingest at a given
parallelism, launched via spark-submit --py-files (north_rule run mode).
Prints one JSON line on stdout (marker-prefixed)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ingest.cdc.runner import run_increment
from stellar_ingest.session import get_spark

MARKER = "SCALING_RESULT "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--shuffle-partitions", type=int, required=True)
    ap.add_argument("--events", type=int, required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(
        f"scaling-{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    recs = run_increment(
        spark,
        args.ledger,
        args.table,
        args.checkpoint,
        max_segments_per_part=None,
        salts=None,
        num_buckets=args.buckets,
    )
    wall = time.monotonic() - t0
    out = {
        "cores": args.cores,
        "shuffle_partitions": args.shuffle_partitions,
        "events": args.events,
        "epochs": len({r["epoch"] for r in recs}),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(args.events / wall, 1),
    }
    print(MARKER + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
