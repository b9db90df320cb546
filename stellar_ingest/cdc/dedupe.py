"""LSN/offset dedupe + per-partition high-watermark (SURVEY.md §2 op 66).

At-least-once ledger delivery re-emits rows with the same
``(src_part, lsn)`` in later segments (FIXTURES.md §C).  Exactly-once at
the source = two filters:

1. **HWM filter** — drop anything at-or-below the checkpointed
   high-watermark for its source partition.  The predicate is a literal
   per-partition OR-chain, so it pushes down to parquet footers (ledger
   segments are lsn-sorted → already-consumed segments are skipped
   without reading a row).
2. **in-batch dedupe** — ``dropDuplicates(["src_part","lsn"])``.  Safe
   because (src_part, lsn) identifies one logical mutation; duplicate
   deliveries carry identical payloads.

Scale: the HWM map is O(source partitions) — driver-side literals, no
join, no shuffle.  dropDuplicates shuffles on (src_part, lsn), a
uniformly distributed key (no skew by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hwm_predicate(offsets: dict[int, int]):
    """Column predicate: keep rows with lsn strictly above their source
    partition's high-watermark (unknown partitions pass)."""
    if not offsets:
        return F.lit(True)
    pred = None
    for part, hwm in sorted(offsets.items()):
        clause = (F.col("src_part") == int(part)) & (F.col("lsn") > int(hwm))
        pred = clause if pred is None else (pred | clause)
    known = F.col("src_part").isin([int(p) for p in offsets])
    return pred | ~known


def dedupe(df: DataFrame, offsets: dict[int, int] | None = None) -> DataFrame:
    """HWM filter + (src_part, lsn) duplicate drop."""
    out = df
    if offsets:
        out = out.filter(hwm_predicate(offsets))
    return out.dropDuplicates(["src_part", "lsn"])


def new_offsets(df: DataFrame, offsets: dict[int, int] | None = None) -> dict[int, int]:
    """Post-batch high-watermarks: max(lsn) per src_part merged over the
    prior offsets.  One tiny agg (partial map-side combine, ≤P rows out)."""
    rows = df.groupBy("src_part").agg(F.max("lsn").alias("hwm")).collect()
    merged = dict(offsets or {})
    for r in rows:
        p = int(r["src_part"])
        merged[p] = max(int(r["hwm"]), merged.get(p, -1))
    return merged
