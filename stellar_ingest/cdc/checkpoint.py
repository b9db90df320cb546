"""Checkpoint store (SURVEY.md §2 op 9): the exactly-once fencing triple
``{epoch, offsets, snapshot_id}``, fsync'd + atomically swapped.

State deliberately lives here and in lake snapshot summaries — not in
Spark's state store — so restart needs nothing but these two JSON reads
(SURVEY.md §2 op 59 design decision).
"""

from __future__ import annotations

import json
import os
import uuid


def _norm(ck: dict) -> dict:
    return {
        "epoch": int(ck.get("epoch", 0)),
        "offsets": {int(k): int(v) for k, v in (ck.get("offsets") or {}).items()},
        "snapshot_id": ck.get("snapshot_id"),
        # advisory skew hint (salting fan-out for the next epoch) — not
        # part of the fencing triple, correctness never depends on it
        "salt_hint": ck.get("salt_hint"),
    }


def initial() -> dict:
    return {"epoch": 0, "offsets": {}, "snapshot_id": None}


def load(checkpoint_dir: str) -> dict:
    path = os.path.join(checkpoint_dir, "checkpoint.json")
    if not os.path.exists(path):
        return initial()
    with open(path) as fh:
        return _norm(json.load(fh))


def save(checkpoint_dir: str, ck: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "checkpoint.json")
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    payload = {
        "epoch": int(ck["epoch"]),
        "offsets": {str(k): int(v) for k, v in ck["offsets"].items()},
        "snapshot_id": ck["snapshot_id"],
        "salt_hint": ck.get("salt_hint"),
    }
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
