"""N -> 4N scaling criterion on the steady-state merge-on-read path.

Runs the SAME sustained-apply job (preload + K incremental MoR epochs,
bench/steady_state.py::run_steady_state) at two parallelism levels with
a constant physical plan (fixed shuffle partitions, write salt pinned
via STELLAR_WRITE_SALT=1), each level in a fresh JVM, and reports
throughput at both plus scaling efficiency.

This sandbox has no real cluster; two local[N] levels on the same input
are the honest stand-in for the rule's two-cluster-size criterion (the
host microVM anti-scales ANY Spark job beyond ~8 threads — see
BENCH/BASELINE.md round 1 — so the constant-plan 1->4 pair is the
meaningful measurement, same protocol as the drain-path runs in rounds
1-2).

Usage: python bench/mor_scaling.py   # ~15 min; prints one JSON line
Env: MOR_SCALE_LEVELS="1,4" MOR_SCALE_CONVS=1000000
     MOR_SCALE_INC_EVENTS=1000000 MOR_SCALE_EPOCHS=4
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["STELLAR_WRITE_SALT"] = "1"
import importlib.util
spec = importlib.util.spec_from_file_location(
    "steady_state", os.path.join({repo!r}, "bench", "steady_state.py"))
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from stellar_ingest.session import get_spark
extra = {{}}
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/stellar_morscale", exist_ok=True)
    extra["spark.local.dir"] = "/dev/shm/stellar_morscale"
spark = get_spark("mor-scale", cores={cores}, shuffle_partitions=8, extra_conf=extra)
res = mod.run_steady_state(spark, n_convs={convs}, inc_events={inc}, inc_epochs={epochs},
                           modes=(("mor", "mor", None),))
print("RESULT" + json.dumps(res))
"""


def main() -> int:
    levels = [int(x) for x in os.environ.get("MOR_SCALE_LEVELS", "1,4").split(",")]
    convs = int(os.environ.get("MOR_SCALE_CONVS", "1000000"))
    inc = int(os.environ.get("MOR_SCALE_INC_EVENTS", "1000000"))
    epochs = int(os.environ.get("MOR_SCALE_EPOCHS", "4"))
    results: dict[int, dict] = {}
    for cores in levels:
        code = _CHILD.format(repo=REPO, cores=cores, convs=convs, inc=inc, epochs=epochs)
        p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-3000:], file=sys.stderr)
            return 1
        results[cores] = json.loads(line[0][len("RESULT"):])
        shutil.rmtree("/dev/shm/stellar_morscale", ignore_errors=True)
    lo, hi = min(levels), max(levels)
    t_lo = results[lo]["mean_events_per_sec"]["mor"]
    t_hi = results[hi]["mean_events_per_sec"]["mor"]
    print(json.dumps({
        "levels": levels,
        "mor_eps": {str(c): results[c]["mean_events_per_sec"]["mor"] for c in levels},
        "epochs_eps": {str(c): results[c]["epoch_events_per_sec"]["mor"] for c in levels},
        "preload_events": results[lo]["preload_events"],
        "speedup": round(t_hi / t_lo, 3),
        "efficiency": round(t_hi / t_lo / (hi / lo), 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
