"""Schema-driven row validation (SURVEY.md §2 op 15).

Capability lineage: schema validation against a declared mapping is core
upstream stellar-ingest behavior [PK-high, SURVEY.md §1.1] — rows that
violate the declared schema are quarantined, never silently dropped.

One predicate, two filtered branches off the same plan (Catalyst
re-reads or reuses the scan; no shuffle, fully pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")
VALID_ROLES = ("user", "assistant", "system", "tool")


def validity_predicate():
    key_ok = (
        F.col("conv_id").isNotNull()
        & (F.length("conv_id") > 0)
        & F.col("turn_idx").isNotNull()
        & (F.col("turn_idx") >= 0)
    )
    env_ok = (
        F.col("lsn").isNotNull()
        & F.col("src_part").isNotNull()
        & F.col("op").isin(list(VALID_OPS))
        & F.col("ts").isNotNull()
    )
    # payload rules apply to upserts only; deletes carry just the key
    role_ok = (F.col("op") == "D") | F.col("role").isNull() | F.col("role").isin(
        list(VALID_ROLES)
    )
    text_ok = (F.col("op") == "D") | F.col("text").isNotNull()
    # null-safe: a NULL op makes isin() evaluate to SQL NULL, which both
    # filter(pred) and filter(~pred) would drop — coalesce to False so
    # such rows land in (and are counted by) the quarantine branch
    return F.coalesce(key_ok & env_ok & role_ok & text_ok, F.lit(False))


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) branches of a changelog batch."""
    pred = validity_predicate()
    return df.filter(pred), df.filter(~pred)
