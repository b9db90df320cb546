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


def batch_partition_stats(batch: DataFrame) -> list[dict]:
    """(src_part, lsn_from, lsn_to, rows) for a bounded batch — one tiny
    map-side-combined agg, ≤P rows to the driver."""
    rows = (
        batch.groupBy("src_part")
        .agg(
            F.min("lsn").alias("lsn_from"),
            F.max("lsn").alias("lsn_to"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    return [
        {
            "src_part": int(r["src_part"]),
            "lsn_from": int(r["lsn_from"]),
            "lsn_to": int(r["lsn_to"]),
            "rows": int(r["rows"]),
        }
        for r in sorted(rows, key=lambda r: r["src_part"])
    ]


def batch_stats_with_quarantine(raw: DataFrame, valid_pred) -> tuple[list[dict], int]:
    """Fused stats pass: per-partition lineage of VALID rows + the
    quarantine count, in ONE traversal of the (cached) batch instead of
    two (count + groupBy) — the per-epoch fixed cost matters for
    micro-batch throughput."""
    flagged = raw.groupBy("src_part", valid_pred.alias("__ok")).agg(
        F.min("lsn").alias("lsn_from"),
        F.max("lsn").alias("lsn_to"),
        F.count(F.lit(1)).alias("rows"),
    )
    stats: dict[int, dict] = {}
    quarantined = 0
    for r in flagged.collect():
        if r["__ok"]:
            stats[int(r["src_part"])] = {
                "src_part": int(r["src_part"]),
                "lsn_from": int(r["lsn_from"]),
                "lsn_to": int(r["lsn_to"]),
                "rows": int(r["rows"]),
            }
        else:
            quarantined += int(r["rows"])
    return [stats[k] for k in sorted(stats)], quarantined


def emit(
    checkpoint_dir: str,
    *,
    epoch: int,
    snapshot_id: int,
    partition_stats: list[dict],
    wall_ms: float,
    quarantined: int = 0,
) -> list[dict]:
    """Append one lineage record per (epoch, src_part) + return them."""
    total = sum(p["rows"] for p in partition_stats)
    eps = (total / (wall_ms / 1000.0)) if wall_ms > 0 else float("inf")
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
        }
        for p in partition_stats
    ]
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
