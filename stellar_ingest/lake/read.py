"""Snapshot scan / time travel over icebox tables (SURVEY.md §2 op 5).

Reads are manifest-driven: the file list comes from table metadata (with
optional bucket pruning), then a plain pushdown-capable
``spark.read.schema(...).parquet(*files)`` — so Catalyst still does
predicate pushdown / column pruning inside each file, while partition
pruning happened at the metadata level for free.

Schema evolution: files written under an older schema simply lack the
newer columns; reading with the *current* explicit schema makes Spark
backfill them as NULL (additive-evolution read semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import IceboxTable

#: engine-internal columns carried in every stored row (LWW ordering +
#: lineage); user-facing reads drop them.
META_COLS = ("_ts", "_lsn", "_src_part", "_op")


def scan(
    spark: SparkSession,
    table: IceboxTable,
    *,
    snapshot_id: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Full-fidelity scan of one snapshot (includes tombstones + meta
    columns).  ``snapshot_id=None`` → current; pass an older id for time
    travel."""
    meta = table.metadata()
    sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
    if sid is None:
        return spark.createDataFrame([], table.schema_struct())
    # time travel reads the snapshot's schema; current reads use the
    # current schema (evolved columns backfill NULL over old files)
    schema = (
        table.schema_struct()
        if snapshot_id is None
        else table.schema_struct(table.snapshot(sid)["schema_id"])
    )
    paths = table.file_paths(sid, buckets)
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def read_changes(
    spark: SparkSession,
    table: IceboxTable,
    since_snapshot_id: int,
    *,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental consumer read (net-effect CDC between snapshots):
    every key whose CURRENT state was written after ``since_snapshot_id``
    — upserts as live rows, deletes as ``_op='D'`` tombstone rows, meta
    columns retained so consumers can order/dedupe downstream.

    Implementation: each CDC snapshot summary checkpoints per-source
    high-watermarks; stored rows carry their winning (_src_part, _lsn).
    The diff is ONE pushdown-friendly filter ``_lsn > hwm[_src_part]``
    over the newer snapshot — no join, no second snapshot scan, and
    compaction rewrites (same rows, same _lsn) never produce phantom
    changes.  Net-effect semantics: a key mutated twice since the base
    snapshot appears once, with its latest state — the right contract
    for downstream table sync (replaying the ledger gives the full
    event history if needed)."""
    from ..cdc.dedupe import hwm_predicate

    base = table.snapshot(since_snapshot_id)["summary"].get("offsets", {})
    if not base:
        # a snapshot without checkpointed watermarks (plain append,
        # streaming ss_batch fence, compaction of such) cannot anchor an
        # incremental read — refuse loudly instead of returning the
        # whole table as "changes"
        raise ValueError(
            f"snapshot {since_snapshot_id} carries no source offsets in its "
            "summary; incremental reads need a CDC-committed base snapshot"
        )
    df = scan(spark, table, snapshot_id=snapshot_id)
    return df.filter(
        hwm_predicate(
            {int(k): int(v) for k, v in base.items()},
            part_col="_src_part",
            lsn_col="_lsn",
        )
    )


def read_live(
    spark: SparkSession,
    table: IceboxTable,
    *,
    snapshot_id: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """User-facing view: tombstones filtered out, meta columns dropped."""
    df = scan(spark, table, snapshot_id=snapshot_id, buckets=buckets)
    if "_op" in df.columns:
        df = df.filter(F.col("_op") != F.lit("D"))
    return df.drop(*[c for c in META_COLS if c in df.columns])
