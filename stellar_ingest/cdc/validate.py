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

#: the predicate as ONE SQL string, parsed in a single py4j call:
#: composing it through Column operators costs ~25 py4j round-trips
#: (~55 ms of driver time) and the CDC loop builds it several times per
#: epoch (round-6 profile).  Same Catalyst expressions, same null-safety:
#: a NULL op makes IN evaluate to SQL NULL, which both filter(pred) and
#: filter(NOT pred) would drop — COALESCE to false lands such rows in
#: (and counts them toward) the quarantine branch.  Payload rules apply
#: to upserts only; deletes carry just the key.
VALIDITY_SQL = (
    "COALESCE("
    "conv_id IS NOT NULL AND length(conv_id) > 0 "
    "AND turn_idx IS NOT NULL AND turn_idx >= 0 "
    "AND lsn IS NOT NULL AND src_part IS NOT NULL "
    f"AND op IN ({', '.join(repr(o) for o in VALID_OPS)}) AND ts IS NOT NULL "
    f"AND (op = 'D' OR role IS NULL OR role IN ({', '.join(repr(r) for r in VALID_ROLES)})) "
    "AND (op = 'D' OR text IS NOT NULL)"
    ", false)"
)


def validity_predicate():
    return F.expr(VALIDITY_SQL)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) branches of a changelog batch."""
    pred = validity_predicate()
    return df.filter(pred), df.filter(~pred)
