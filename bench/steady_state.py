"""Steady-state MERGE-apply bench: sustained incremental epochs into a
PRE-LOADED table, copy-on-write vs merge-on-read.

The headline drain bench (bench.py) measures backfill into an EMPTY
table — it never pays the steady-state cost the north star actually
describes (sustained apply into a 10^10-event table).  This bench does:

1. preload the table with a full ``gen_events`` ledger (one backfill
   epoch, identical compacted starting state for every mode);
2. apply E incremental epochs of N update events each, spread uniformly
   over the existing keyspace (every epoch touches every bucket — the
   adversarial-but-realistic shape for copy-on-write);
3. report per-epoch events/sec per mode.

Expected shape: COW epoch cost grows with TABLE size (it rewrites every
touched bucket), so its per-epoch ev/s is far below the backfill number
and would shrink further as the table grows; MoR epochs are Θ(batch)
and stay roughly flat regardless of table size.  ``mor+fold`` shows the
amortized cost of folding deltas back down on a commit-count policy.

Results land in BENCH/BASELINE.md; bench.py runs a bounded variant per
round (keys ``cdc_steady_*``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from stellar_ingest.cdc.runner import run_increment  # noqa: E402
from stellar_ingest.gen.changelog import (  # noqa: E402
    append_update_segment,
    gen_events,
    gen_update_stream,
    keyspace,
    write_ledger,
)

#: first increment lsn: far above any preload lsn (gen_events tops out
#: around v=23 → lsn < 24*ks; 64*ks leaves room and stays deterministic)
_INC_LSN_FACTOR = 64

#: (name, runner mode, fold_min_deltas — delta COMMITS per bucket)
DEFAULT_MODES = (
    ("cow", "cow", None),
    ("mor", "mor", None),
    ("mor+fold8", "mor", 8),
)


def run_steady_state(
    spark: SparkSession,
    *,
    n_convs: int,
    inc_events: int,
    inc_epochs: int,
    parts: int = 8,
    num_buckets: int = 32,
    modes=DEFAULT_MODES,
    work_dir: str | None = None,
) -> dict:
    scratch_base = work_dir or ("/dev/shm" if os.path.isdir("/dev/shm") else None)
    work = tempfile.mkdtemp(prefix="stellar_steady_", dir=scratch_base)
    ks = keyspace(n_convs)
    out: dict = {"n_convs": n_convs, "inc_events": inc_events, "inc_epochs": inc_epochs}
    try:
        ev = gen_events(spark, n_convs, parts=parts, seed=42)
        preload_events = ev.count()
        out["preload_events"] = int(preload_events)
        base_ledger = os.path.join(work, "ledger_base")
        write_ledger(ev, base_ledger, n_convs=n_convs, seg_span=ks)
        epochs: dict[str, list[float]] = {}
        for spec in modes:
            # (name, mode, fold_min[, fold_max_buckets])
            name, mode, fold_min = spec[0], spec[1], spec[2]
            fold_max = spec[3] if len(spec) > 3 else None
            mdir = os.path.join(work, name.replace("+", "_"))
            ledger = os.path.join(mdir, "ledger")
            table = os.path.join(mdir, "table")
            ck = os.path.join(mdir, "ck")
            shutil.copytree(base_ledger, ledger)
            t0 = time.monotonic()
            run_increment(
                spark, ledger, table, ck,
                max_segments_per_part=None, max_epochs=1, salts=None,
                num_buckets=num_buckets,
            )
            out.setdefault("preload_wall_sec", {})[name] = round(time.monotonic() - t0, 3)
            walls: list[float] = []
            for k in range(inc_epochs):
                inc = gen_update_stream(
                    spark, n_convs,
                    n_events=inc_events,
                    lsn_base=_INC_LSN_FACTOR * ks + k * inc_events,
                    parts=parts, seed=777,
                )
                append_update_segment(inc, ledger, seg_no=1000 + k)
                t0 = time.monotonic()
                run_increment(
                    spark, ledger, table, ck,
                    max_segments_per_part=None, max_epochs=1, salts=None,
                    num_buckets=num_buckets, mode=mode,
                    fold_min_deltas=fold_min, fold_max_buckets=fold_max,
                )
                walls.append(time.monotonic() - t0)
            epochs[name] = [round(inc_events / w, 1) for w in walls]
            shutil.rmtree(mdir, ignore_errors=True)
        out["epoch_events_per_sec"] = epochs
        out["mean_events_per_sec"] = {
            name: round(sum(e) / len(e), 1) for name, e in epochs.items()
        }
        # steady-state headline: MoR mean / COW mean (how much the delta
        # commit mode buys at this table:batch ratio)
        if "cow" in epochs and "mor" in epochs:
            out["mor_over_cow"] = round(
                out["mean_events_per_sec"]["mor"] / out["mean_events_per_sec"]["cow"], 2
            )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    from stellar_ingest.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("STELLAR_STEADY_CONVS", "3000000"))
    inc_events = int(os.environ.get("STELLAR_STEADY_INC_EVENTS", "1000000"))
    inc_epochs = int(os.environ.get("STELLAR_STEADY_EPOCHS", "8"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/stellar_steady_local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/stellar_steady_local"
    spark = get_spark(
        "stellar-steady", cores=cpus, shuffle_partitions=8 * cpus, extra_conf=extra
    )
    res = run_steady_state(
        spark, n_convs=n_convs, inc_events=inc_events, inc_epochs=inc_epochs
    )
    res["cpus"] = cpus
    print(json.dumps(res))
    shutil.rmtree("/dev/shm/stellar_steady_local", ignore_errors=True)


if __name__ == "__main__":
    main()
