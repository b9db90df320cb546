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
