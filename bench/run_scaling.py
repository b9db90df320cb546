"""Scaling-efficiency evidence (north_rule, BASELINE.json:14): the same
seeded ledger ingested at local[8] and local[32] — the driver-sanctioned
sandbox stand-in for N vs 4N executors — each in its OWN JVM via
``spark-submit --py-files stellar_ingest.zip``.  Writes the measured
table into BENCH/BASELINE.md and prints a JSON summary.

Efficiency = (eps_32 / eps_8) / 4; target >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# bench.py (file) shadows the bench/ dir as a module — duplicate the
# marker constant instead of importing it
MARKER = "SCALING_RESULT "

SMALL, LARGE = 8, 32


def build_pyfiles_zip(dest: str) -> str:
    zpath = os.path.join(dest, "stellar_ingest.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "stellar_ingest")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_one(zpath: str, ledger: str, work: str, cores: int, events: int) -> dict:
    # Fixed moderate heap for BOTH runs: measured on this host, a 16-32g
    # G1 heap makes the merge stage 5-10x slower and wildly variable
    # under local[32] (lazy heap growth + giant in-memory sorts); 8g is
    # stable at both parallelism levels and the 2.5-10M-event batches
    # never spill.  (--driver-memory must be a LAUNCH flag; setting
    # spark.driver.memory at session time is ignored under spark-submit.)
    out = subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", "8g",
            "--py-files", zpath,
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "bench", "scaling_job.py"),
            "--ledger", ledger,
            "--table", f"{work}/table_{cores}",
            "--checkpoint", f"{work}/ck_{cores}",
            "--cores", str(cores),
            "--shuffle-partitions", str(8 * cores),
            "--events", str(events),
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith(MARKER):
            return json.loads(line[len(MARKER):])
    raise RuntimeError(
        f"no result marker from spark-submit local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def prepare_ledger(work: str, n_convs: int) -> int:
    """Generate the shared seeded ledger (separate step so repeat runs
    reuse it: STELLAR_SCALING_LEDGER=<dir>)."""
    from stellar_ingest.gen.changelog import gen_events, keyspace, write_ledger
    from stellar_ingest.session import get_spark

    spark = get_spark("scaling-gen", cores=LARGE, shuffle_partitions=64)
    ev = gen_events(spark, n_convs, parts=8, seed=42)
    events = ev.count()
    write_ledger(ev, f"{work}/ledger", n_convs=n_convs, seg_span=keyspace(n_convs) // 2)
    with open(f"{work}/events.txt", "w") as fh:
        fh.write(str(events))
    spark.stop()
    return events


def main():
    n_convs = int(os.environ.get("STELLAR_SCALING_CONVS", "1000000"))
    work = os.environ.get("STELLAR_SCALING_LEDGER") or tempfile.mkdtemp(
        prefix="stellar_scaling_"
    )
    ledger = f"{work}/ledger"
    if os.path.isdir(ledger) and os.path.exists(f"{work}/events.txt"):
        events = int(open(f"{work}/events.txt").read())
    else:
        events = prepare_ledger(work, n_convs)
    if os.environ.get("STELLAR_SCALING_GEN_ONLY"):
        print(json.dumps({"ledger": ledger, "events": events}))
        return

    zpath = build_pyfiles_zip(work)
    r_small = run_one(zpath, ledger, work, SMALL, events)
    r_large = run_one(zpath, ledger, work, LARGE, events)

    eff = (r_large["events_per_sec"] / r_small["events_per_sec"]) / (LARGE / SMALL)
    summary = {
        "events": events,
        "small": r_small,
        "large": r_large,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary, indent=1))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            "# BENCH/BASELINE.md — measured scaling evidence\n\n"
            "Same seeded synthetic ledger (gen/changelog.py, seed=42) ingested end-to-end\n"
            "(validate → HWM dedupe → LWW resolve → MERGE COW upsert → epoch-fenced commit)\n"
            "at two parallelism levels, each in its own JVM via `spark-submit --py-files\n"
            "stellar_ingest.zip` — the driver-sanctioned stand-in for N vs 4N executors.\n\n"
            "| run | parallelism | shuffle partitions | input events | wall s | events/sec | efficiency vs local[8] |\n"
            "|---|---|---|---|---|---|---|\n"
            f"| measured | local[{SMALL}] | {8*SMALL} | {events} | {r_small['wall_sec']} | {r_small['events_per_sec']} | 1.00 (base) |\n"
            f"| measured | local[{LARGE}] | {8*LARGE} | {events} | {r_large['wall_sec']} | {r_large['events_per_sec']} | {round(eff,3)} (target ≥ 0.8 of 4x) |\n\n"
            f"Scaling efficiency (eps_{LARGE} / eps_{SMALL}) / {LARGE//SMALL} = **{round(eff,3)}** — "
            f"{'PASS' if eff >= 0.8 else 'BELOW TARGET'}.\n\n"
            "Extrapolation note: the 10^10-event design scale is NOT measured here (sandbox);\n"
            "per-event cost is dominated by the two shuffles per micro-batch (resolve +\n"
            "bucket write), both on fine-grained uniform keys, so throughput scales with\n"
            "cores until the driver-side commit (O(ms) JSON rename) saturates — at 10^10\n"
            "events that term stays <0.1% of batch wall at any realistic batch size.\n"
        )


if __name__ == "__main__":
    main()
