"""Shared test utilities: tiny hand-written changelogs + a pandas LWW
oracle independent of the engine (FIXTURES.md §D: "expected LWW state is
recomputed independently in pandas").
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from stellar_ingest.schema import CHANGELOG_SCHEMA

COLS = ["lsn", "src_part", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def ts(sec: int) -> datetime:
    return datetime.fromtimestamp(1767225600 + sec, tz=timezone.utc).replace(tzinfo=None)


def make_changelog(spark, rows):
    """rows: list of (lsn, src_part, op, conv_id, turn_idx, role, text, tool, sec)."""
    data = [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], ts(r[8])) for r in rows]
    return spark.createDataFrame(data, CHANGELOG_SCHEMA)


def expected_lww_pandas(events: pd.DataFrame, payload_cols=("role", "text", "tool")) -> pd.DataFrame:
    """Independent oracle: dedupe (src_part, lsn), pick max (ts, lsn,
    src_part) per key, drop keys whose winner is a delete."""
    df = events.drop_duplicates(subset=["src_part", "lsn"]).copy()
    df = df.sort_values(["ts", "lsn", "src_part"], kind="mergesort")
    # tail(1) keeps the whole winning ROW (groupby().last() would take
    # the last NON-NULL per column, mixing rows)
    last = df.groupby(["conv_id", "turn_idx"], as_index=False).tail(1)
    live = last[last["op"] != "D"]
    cols = ["conv_id", "turn_idx", *payload_cols, "ts"]
    cols = [c for c in cols if c in live.columns]
    return (
        live[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
