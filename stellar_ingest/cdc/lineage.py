"""Per-batch lineage + throughput metrics (SURVEY.md §2 ops 10/74;
BASELINE.json:6 "per-partition lineage (source offset range → snapshot)
and throughput metrics are emitted each batch").

Capability lineage: the reference reports ingestion job status to its
coordinator [PK-med, SURVEY.md §1.1]; here that becomes an append-only
JSONL audit log binding each (epoch, src_part) offset range to the lake
snapshot that contains it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEAGE_FILE = "lineage.jsonl"


def observed_stats(raw: DataFrame, valid_pred, parts: list[int]):
    """Zero-extra-pass lineage: attach an ``observe`` node computing
    per-partition (lsn_from, lsn_to, rows) for valid rows + the
    quarantine count as a SIDE EFFECT of whatever action consumes the
    batch next (the MERGE itself) — the ledger is scanned exactly once
    per epoch.  Returns (observed_df, Observation); call
    ``collect_observed_stats`` after the action ran."""
    from pyspark.sql import Observation

    exprs = [F.count(F.when(~valid_pred, 1)).alias("quarantined")]
    for p in sorted(parts):
        ok = valid_pred & (F.col("src_part") == int(p))
        exprs += [
            F.min(F.when(ok, F.col("lsn"))).alias(f"from_{p}"),
            F.max(F.when(ok, F.col("lsn"))).alias(f"to_{p}"),
            F.count(F.when(ok, 1)).alias(f"rows_{p}"),
        ]
    obs = Observation("batch_stats")
    return raw.observe(obs, *exprs), obs


def collect_observed_stats(obs, parts: list[int]) -> tuple[list[dict], int]:
    """(partition_stats, quarantined) from a filled Observation."""
    got = obs.get
    stats = []
    for p in sorted(parts):
        if got[f"rows_{p}"]:
            stats.append(
                {
                    "src_part": int(p),
                    "lsn_from": int(got[f"from_{p}"]),
                    "lsn_to": int(got[f"to_{p}"]),
                    "rows": int(got[f"rows_{p}"]),
                }
            )
    return stats, int(got["quarantined"])


def emit(
    checkpoint_dir: str,
    *,
    epoch: int,
    snapshot_id: int,
    partition_stats: list[dict],
    wall_ms: float,
    quarantined: int = 0,
    repaired: bool = False,
) -> list[dict]:
    """Append one lineage record per (epoch, src_part) + return them.

    Idempotent per epoch: the runner emits BEFORE the checkpoint save, so
    a crash in between replays the emit on restart — records for an epoch
    already present in the file are skipped, never duplicated.  The same
    property lets the fence repair re-emit a torn epoch's lineage from
    the snapshot summary (``repaired=True``, no wall-clock available)."""
    total = sum(p["rows"] for p in partition_stats)
    eps = (total / (wall_ms / 1000.0)) if wall_ms > 0 else 0.0
    records = [
        {
            "epoch": epoch,
            "src_part": p["src_part"],
            "lsn_from": p["lsn_from"],
            "lsn_to": p["lsn_to"],
            "snapshot_id": snapshot_id,
            "rows": p["rows"],
            "wall_ms": round(wall_ms, 3),
            "events_per_sec": round(eps, 3),
            "quarantined": quarantined,
            "repaired": repaired,
        }
        for p in partition_stats
    ]
    if any(r["epoch"] == epoch for r in read_lineage(checkpoint_dir)):
        return records
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, LINEAGE_FILE)
    with open(path, "a") as fh:
        for rec in records:
            fh.write(json.dumps(rec, sort_keys=True) + "\n")
    return records


def read_lineage(checkpoint_dir: str) -> list[dict]:
    path = os.path.join(checkpoint_dir, LINEAGE_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
