"""Order-insensitive whole-table state fingerprint (SURVEY.md §2 op 34).

"Replay from any checkpoint reconverges to byte-identical table state"
(BASELINE.json:6) is asserted via a canonical per-row serialization →
per-row hash → order-insensitive combine (XOR of xxhash64 + SUM of a
sha2 prefix as decimal + row count).  Canonical serialization pins the
ambiguity floating row order / timestamps would otherwise introduce:
timestamps become unix micros, NULL gets a dedicated sentinel distinct
from any real value.

Fully distributed: two aggregates, no sort, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NULL = "\x00<NULL>"
_SEP = "\x1f"


def canonical_row(df: DataFrame, cols: list[str] | None = None):
    """Canonical string for each row (deterministic, type-pinned)."""
    cols = cols or sorted(df.columns)
    parts = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, T.TimestampType):
            expr = F.unix_micros(F.col(c)).cast("string")
        elif isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
            # fixed textual form so -0.0/0.0 and exponent formatting can't drift
            expr = F.format_number(F.col(c).cast("double"), 9)
        else:
            expr = F.col(c).cast("string")
        parts.append(F.coalesce(expr, F.lit(_NULL)))
    return F.concat_ws(_SEP, *parts)


def table_fingerprint(df: DataFrame, cols: list[str] | None = None) -> dict:
    """{rows, xor, sum} — equal dicts ⇔ equal multisets of rows (up to
    hash collision, 128+ bits combined)."""
    canon = canonical_row(df, cols)
    agg = df.select(
        F.xxhash64(canon).alias("h64"),
        F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10)
        .cast(T.DecimalType(38, 0))
        .alias("h60"),
    ).agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor("h64").alias("xor"),
        F.sum("h60").alias("sum"),
    )
    r = agg.collect()[0]
    return {
        "rows": int(r["rows"]),
        "xor": int(r["xor"]) if r["xor"] is not None else 0,
        "sum": str(r["sum"]) if r["sum"] is not None else "0",
    }
