"""Last-writer-wins resolution (SURVEY.md §2 ops 35/67, BASELINE.json:6).

The newest mutation per (conv_id, turn_idx), "newest" = max by
``(ts, lsn, src_part)`` descending — (ts, lsn) per the spec, src_part as
the final tiebreak so ordering is total (only (src_part, lsn) is
globally unique; FIXTURES.md §C makes ts deliberately non-monotone in
lsn for 10% of rows).

UDF-free: one ranking window (Exchange on hash(conv_id, turn_idx) +
in-partition sort).  Optionally two-phase **salted** for hot keys
(SURVEY.md op 25): phase 1 ranks within (key, salt), phase 2 ranks the
≤S phase-1 survivors per key.  Correct because "take the max by a total
order" is associative — max(max per salt) = max overall
(tests/test_skew.py proves equality salted vs not).

Scale: phase 1 spreads one hot key over S shuffle partitions, bounding
any single task at ~rows(hot)/S; phase 2 touches only #keys x S rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import ENVELOPE_COLS


def _desc_order():
    return [F.col("ts").desc(), F.col("lsn").desc(), F.col("src_part").desc()]


def lww_winners(
    df: DataFrame, *, salts: int | None = None, rn_observation=None
) -> DataFrame:
    """Reduce a deduped changelog batch to one winning mutation per
    (conv_id, turn_idx), keeping changelog column shape.

    ``rn_observation``: optional ``pyspark.sql.Observation`` filled with
    ``max_rn`` — the max per-key mutation count the ranking window saw
    (per (key, salt) when salted, so scale by ``salts`` to estimate the
    true per-key max).  This is the FREE hot-key census: the window
    already numbers every key's rows, so observing ``max(__rn)`` costs
    nothing extra — no sample pass, no second scan (the runner uses it
    to decide the NEXT epoch's salting; skew persists across adjacent
    batches)."""
    if salts and salts > 1:
        salt = F.pmod(F.xxhash64("src_part", "lsn"), F.lit(int(salts)))
        w1 = Window.partitionBy("conv_id", "turn_idx", salt).orderBy(*_desc_order())
        ranked = df.withColumn("__rn", F.row_number().over(w1))
        if rn_observation is not None:
            ranked = ranked.observe(rn_observation, F.max("__rn").alias("max_rn"))
            rn_observation = None
        df = ranked.filter(F.col("__rn") == 1).drop("__rn")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(*_desc_order())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if rn_observation is not None:
        ranked = ranked.observe(rn_observation, F.max("__rn").alias("max_rn"))
    return ranked.filter(F.col("__rn") == 1).drop("__rn")


def to_table_rows(winners: DataFrame, *, carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Changelog-shaped winners → stored-table shape: payload columns +
    (_ts, _lsn, _src_part, _op).  Deletes become tombstones ('D') with
    NULL payload; I/U normalize to 'U' (both are upserts once resolved).

    ``carry_cols``: layout helper columns (e.g. __bucket/__salt from the
    fused single-exchange merge path) passed through untouched — they
    are excluded from the payload and appended last, preserving their
    attribute identity so downstream sort/partitioning properties
    survive the projection."""
    payload = [
        c
        for c in winners.columns
        if c not in ENVELOPE_COLS and c != "ts" and c not in carry_cols
    ]
    is_del = F.col("op") == "D"
    cols = []
    for c in payload:
        if c in ("conv_id", "turn_idx"):
            cols.append(F.col(c))
        else:
            cols.append(F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c))
    cols.append(F.when(is_del, F.lit(None)).otherwise(F.col("ts")).alias("ts"))
    cols += [
        F.col("ts").alias("_ts"),
        F.col("lsn").alias("_lsn"),
        F.col("src_part").alias("_src_part"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("_op"),
    ]
    cols += [F.col(c) for c in carry_cols]
    return winners.select(*cols)


def resolve(
    df: DataFrame, *, salts: int | None = None, rn_observation=None
) -> DataFrame:
    """dedupe'd changelog batch → stored-table-shaped winner rows."""
    return to_table_rows(
        lww_winners(df, salts=salts, rn_observation=rn_observation)
    )
