"""A/B measurement for the round-2 discovery-prefetch overlap
(cdc/runner.py): drain the same ledger in MANY small epochs with and
without prefetch; the delta is the per-epoch driver-side discovery cost
that overlapping hides behind the merge.

Usage: python bench/epoch_overlap.py <ledger_dir> <events> [msp]
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ingest.cdc.runner import run_increment
from stellar_ingest.session import get_spark


def main():
    ledger = sys.argv[1]
    events = int(sys.argv[2])
    msp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("overlap-ab", cores=8, shuffle_partitions=32)
    results = {}
    for mode, env in (("prefetch", "0"), ("no_prefetch", "1")):
        os.environ["STELLAR_NO_PREFETCH"] = env
        walls = []
        for _trial in range(2):
            scratch = tempfile.mkdtemp(prefix=f"overlap_{mode}_", dir="/dev/shm")
            t0 = time.monotonic()
            recs = run_increment(
                spark, ledger, f"{scratch}/t", f"{scratch}/ck",
                max_segments_per_part=msp, salts=None, num_buckets=32,
            )
            walls.append(round(time.monotonic() - t0, 3))
            epochs = len({r["epoch"] for r in recs})
            shutil.rmtree(scratch, ignore_errors=True)
        results[mode] = {"walls": walls, "best": min(walls), "epochs": epochs}
        print(json.dumps({"mode": mode, "epochs": epochs, "walls": walls,
                          "events_per_sec": round(events / min(walls), 1)}))
    os.environ.pop("STELLAR_NO_PREFETCH", None)
    d = results["no_prefetch"]["best"] - results["prefetch"]["best"]
    print(json.dumps({"overlap_saving_sec": round(d, 3),
                      "per_epoch_ms": round(1000 * d / max(results["prefetch"]["epochs"], 1), 1)}))


if __name__ == "__main__":
    main()
