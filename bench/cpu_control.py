"""Engine-free scaling CONTROL: a pure-CPU Spark job (hash + aggregate
over ``spark.range``, zero engine code, zero IO) run at the same two
parallelism levels as bench/mor_scaling.py, each level in a fresh JVM.

Purpose (BENCH/BASELINE.md §r4): this sandbox's microVM caps how well
ANY Spark job scales on a given day, and the cap drifts.  Running the
control in the same session as the engine pair turns the scaling
criterion into an honest ratio — engine efficiency ÷ control efficiency
is the engine's own contribution, with the host factored out.

Usage: python bench/cpu_control.py     # ~1 min; prints one JSON line
Env: CPU_CONTROL_LEVELS="1,4" CPU_CONTROL_ROWS=150000000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from stellar_ingest.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("cpu-control", cores={cores}, shuffle_partitions=8)
df = spark.range({rows}, numPartitions=max(8, {cores} * 4))
# warm the JVM/codegen once on a small slice so the timed run is compute
df.limit(1000).select(F.xxhash64("id").alias("h")).agg(F.count("h")).collect()
t0 = time.monotonic()
# pmod-bound the summed value: ANSI mode (Spark 4 default) rejects a
# long-overflowing SUM of raw 64-bit hashes
out = (
    df.select(F.pmod(F.xxhash64("id"), F.lit(1000003)).alias("h"))
    .groupBy(F.pmod("h", F.lit(64)).alias("g"))
    .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"))
    .agg(F.sum("s"), F.sum("n"))
    .collect()
)
print("RESULT" + json.dumps({{"wall_sec": time.monotonic() - t0,
                              "rows": {rows}, "check": str(out[0][1])}}))
"""


def main() -> int:
    levels = [int(x) for x in os.environ.get("CPU_CONTROL_LEVELS", "1,4").split(",")]
    rows = int(os.environ.get("CPU_CONTROL_ROWS", "150000000"))
    res: dict[int, dict] = {}
    for cores in levels:
        code = _CHILD.format(repo=REPO, cores=cores, rows=rows)
        p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-3000:], file=sys.stderr)
            return 1
        res[cores] = json.loads(line[0][len("RESULT"):])
    lo, hi = min(levels), max(levels)
    sp = res[lo]["wall_sec"] / res[hi]["wall_sec"]
    print(json.dumps({
        "levels": levels,
        "wall_sec": {str(c): round(res[c]["wall_sec"], 2) for c in levels},
        "rows": rows,
        "speedup": round(sp, 3),
        "efficiency": round(sp / (hi / lo), 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
