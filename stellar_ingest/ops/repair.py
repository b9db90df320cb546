"""Per-conversation transcript repair — the grouped-map
``applyInPandas`` exemplar (SURVEY.md §2.10 op 62).

The one §2.10 surface a real user reaches for: imperative per-group
logic (dense turn re-indexing after deletes, forward-filling missing
roles) that is awkward as window algebra but trivial as a pandas
function over one conversation at a time.

OFF the CDC hot path by design (BASELINE.json input_hint bans per-row
Python there; grouped-map Arrow batches are the sanctioned escape
hatch).  Scale: one shuffle on conv_id; each group is one conversation
(bounded rows), so executor memory per group is O(longest transcript) —
safe at any corpus size.  A hot key here would mean one pathological
conversation; the CDC path's census/salting bounds that upstream.

The registered query runs the same repair over an events-derived
"degraded transcript" shape so DuckDB can mirror it exactly
(row_number re-index + last_value IGNORE NULLS forward-fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import tbl

REPAIRED_SCHEMA = (
    "conv_id long, turn_idx int, role string, orig_turn_idx long, ts timestamp"
)


def repair_transcripts(turns: DataFrame, *, default_role: str = "user") -> DataFrame:
    """Grouped-map repair: per conv_id (sorted by the original sparse
    turn order) re-index turns densely from 0 and forward-fill missing
    roles.  Input columns: conv_id, turn_idx, role, ts."""

    def fix(pdf):
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(drop=True)
        pdf["orig_turn_idx"] = pdf["turn_idx"].astype("int64")
        pdf["turn_idx"] = range(len(pdf))
        pdf["role"] = pdf["role"].ffill().fillna(default_role)
        return pdf[["conv_id", "turn_idx", "role", "orig_turn_idx", "ts"]]

    return turns.groupBy("conv_id").applyInPandas(fix, REPAIRED_SCHEMA)


def q_transcript_repair(spark, sf):
    """Degrade events into gappy transcripts (sparse turn ids, ~NULL
    roles), then repair.  Deterministic; DuckDB-mirrorable."""
    e = tbl(spark, sf, "events").filter(F.col("user_id") < 300)
    turns = e.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("value") >= 50.0, F.col("event_type")).alias("role"),
        "ts",
    )
    return repair_transcripts(turns)


ORACLE = {
    "transcript_repair": """
        SELECT user_id AS conv_id,
               CAST(row_number() OVER w - 1 AS INT) AS turn_idx,
               coalesce(
                   last_value(CASE WHEN value >= 50.0 THEN event_type END IGNORE NULLS) OVER w,
                   'user') AS role,
               event_id AS orig_turn_idx,
               ts
        FROM events WHERE user_id < 300
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
}

QUERIES = {"transcript_repair": q_transcript_repair}
