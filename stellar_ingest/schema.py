"""Binding schemas (BASELINE.json:15 verbatim; FIXTURES.md §B/§C).

The stored table row = user columns + engine meta columns:

- ``_ts``/``_lsn``/``_src_part`` — the last-writer-wins ordering triple
  of the mutation that produced the row.  (ts, lsn) is the BASELINE
  order; ``_src_part`` is appended as the final tiebreak because only
  (src_part, lsn) is globally unique, making resolution deterministic.
- ``_op`` — 'U' (upsert) or 'D' (tombstone).  Tombstones are KEPT in the
  table: without them, replaying the same ledger under a different batch
  split could let an older-timestamp update resurrect a deleted key,
  breaking byte-identical replay.  The user-facing view filters them.
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLS = ("conv_id", "turn_idx")
ORDER_COLS = ("_ts", "_lsn", "_src_part")  # LWW ordering, descending

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

META_FIELDS = [
    T.StructField("_ts", T.TimestampType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("_src_part", T.IntegerType(), False),
    T.StructField("_op", T.StringType(), False),
]

#: stored-table schema = user columns + meta columns
TABLE_SCHEMA = T.StructType(TRANSCRIPT_FIELDS + META_FIELDS)

CHANGELOG_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("src_part", T.IntegerType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
]
CHANGELOG_SCHEMA = T.StructType(CHANGELOG_FIELDS)

#: changelog columns that are engine envelope, not payload
ENVELOPE_COLS = ("lsn", "src_part", "op")


def table_schema_for(changelog_schema: T.StructType) -> T.StructType:
    """Stored-table schema induced by a (possibly evolved) changelog
    schema: payload columns in ledger order, then meta columns."""
    payload = [f for f in changelog_schema.fields if f.name not in ENVELOPE_COLS]
    return T.StructType(payload + META_FIELDS)


def ensure_table_schema(table, batch_table_schema, *, hook=None):
    """Additive evolution rule shared by the batch runner and the
    streaming adapter: commit (metadata-only) any column the batch
    carries that the table lacks, BEFORE the data write
    (BASELINE.json ordering requirement).  Returns the new columns."""
    known = {f["name"] for f in table.schema_fields()}
    new_cols = T.StructType(
        [f for f in batch_table_schema.fields if f.name not in known]
    )
    if len(new_cols.fields) > 0:
        if hook is not None:
            hook("pre_evolve")
        table.evolve_schema(new_cols)
    return new_cols
