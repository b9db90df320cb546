"""Changelog tail source (SURVEY.md §2 op 3): incremental, offset-driven
reads of ledger segments — the binlog/WAL-tail analogue.

Ledger layout (FIXTURES.md §C)::

    ledger/part={src_part}/seg={k}/*.parquet    # rows lsn-sorted

Discovery is metadata-only: parquet *footers* give each segment's
(min_lsn, max_lsn) — no data rows are read to decide what is new.  The
read itself is ONE ``spark.read.schema(superset).parquet(files...)``
with a per-partition ``hwm < lsn <= cutoff`` OR-chain that pushes down
to footer stats, so re-listed but already-consumed segments cost zero IO.

Schema evolution arrives here first: newer segments may carry columns
older ones lack (e.g. ``tool``, ``tool_version``).  The batch schema is
the union of the selected files' footer schemas; files missing a column
read back as NULL (additive semantics).

Scale: discovery is a driver-side listing, O(segments) — on a real lake
this is the object-store listing every table format does; per-epoch cost
is bounded by segment count, not data volume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import CHANGELOG_SCHEMA
from .dedupe import hwm_predicate


@dataclass
class Segment:
    path: str
    src_part: int
    min_lsn: int
    max_lsn: int
    rows: int
    columns: tuple[str, ...]
    arrow_schema: pa.Schema


def _lsn_range(pf: pq.ParquetFile) -> tuple[int, int]:
    md, schema = pf.metadata, pf.schema_arrow
    idx = schema.names.index("lsn")
    lo, hi = None, None
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(idx).statistics
        if st is None or not st.has_min_max:
            # ANY stats-less row group invalidates the footer fast-path:
            # a partial range would under-report max_lsn and silently
            # skip that group's rows forever — fall back to reading just
            # the lsn column (column-pruned, one file; rare by
            # construction)
            lo = None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        col = pf.read(columns=["lsn"]).column("lsn")
        import pyarrow.compute as pc

        mm = pc.min_max(col).as_py()
        lo, hi = mm["min"], mm["max"]
    return int(lo), int(hi)


#: footer-stat memo keyed by (path, mtime_ns, size): ledger segments are
#: immutable once written (append-only ledger contract), so each
#: discovery pass only parses footers of files it has not seen — the
#: steady-state loop otherwise re-parses EVERY segment's footer once or
#: twice per epoch (~0.2 s at 400 segments, growing with ledger age).
#: A rewritten file (new mtime/size) re-parses; entries are dropped
#: lazily when their file disappears from a listing.  Metadata only —
#: no row data is ever cached.
_SEG_CACHE: dict[str, tuple[tuple[int, int], Segment]] = {}
_SEG_CACHE_MAX = 65536


def list_segments(ledger_dir: str) -> list[Segment]:
    """All ledger segments with footer-derived lsn ranges (no data IO)."""
    out: list[Segment] = []
    if not os.path.isdir(ledger_dir):
        return out
    for pdir in sorted(os.listdir(ledger_dir)):
        if not pdir.startswith("part="):
            continue
        part = int(pdir.split("=", 1)[1])
        base = os.path.join(ledger_dir, pdir)
        for root, _dirs, files in os.walk(base):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                st = os.stat(full)
                stkey = (st.st_mtime_ns, st.st_size)
                hit = _SEG_CACHE.get(full)
                if hit is not None and hit[0] == stkey:
                    out.append(hit[1])
                    continue
                pf = pq.ParquetFile(full)
                if pf.metadata.num_rows == 0:
                    continue
                lo, hi = _lsn_range(pf)
                seg = Segment(
                    path=full,
                    src_part=part,
                    min_lsn=lo,
                    max_lsn=hi,
                    rows=pf.metadata.num_rows,
                    columns=tuple(pf.schema_arrow.names),
                    arrow_schema=pf.schema_arrow,
                )
                if len(_SEG_CACHE) < _SEG_CACHE_MAX:
                    _SEG_CACHE[full] = (stkey, seg)
                out.append(seg)
    return out


_ARROW_TO_SPARK = {
    "string": T.StringType(),
    "large_string": T.StringType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "bool": T.BooleanType(),
    # opaque media payloads (images/audio/video ride the changelog as
    # bytes + typed metadata; tests/test_binary_column.py end-to-end)
    "binary": T.BinaryType(),
    "large_binary": T.BinaryType(),
}


def _spark_type(arrow_type: pa.DataType) -> T.DataType:
    if pa.types.is_timestamp(arrow_type):
        return T.TimestampType()
    return _ARROW_TO_SPARK[str(arrow_type)]


def batch_schema(segments: list[Segment]) -> T.StructType:
    """Union schema over segments: canonical changelog columns first (in
    contract order), evolved extras after, types from footers."""
    known = {f.name: f for f in CHANGELOG_SCHEMA.fields}
    seen: dict[str, T.DataType] = {}
    order: list[str] = []
    for seg in segments:
        for name in seg.columns:
            if name not in seen:
                seen[name] = (
                    known[name].dataType
                    if name in known
                    else _spark_type(seg.arrow_schema.field(name).type)
                )
                order.append(name)
    fields = [f for f in CHANGELOG_SCHEMA.fields if f.name in seen]
    fields += [
        T.StructField(n, seen[n], True) for n in order if n not in known
    ]
    return T.StructType(fields)


def select_batch(
    segments: list[Segment],
    offsets: dict[int, int],
    *,
    max_segments_per_part: int | None = None,
) -> tuple[list[Segment], dict[int, int]]:
    """Pick the next micro-batch: per source partition, the earliest
    pending segments (capped), and the lsn cutoff the batch will consume
    through.  Deterministic — same offsets + same ledger → same batch."""
    chosen: list[Segment] = []
    cutoffs: dict[int, int] = {}
    by_part: dict[int, list[Segment]] = {}
    for s in segments:
        if s.max_lsn > offsets.get(s.src_part, -1):
            by_part.setdefault(s.src_part, []).append(s)
    for part, segs in sorted(by_part.items()):
        if max_segments_per_part is None:
            cutoff = max(s.max_lsn for s in segs)
        else:
            # lsn ranges of different files interleave (duplicate
            # re-deliveries land in LATER segments carrying OLD lsns —
            # FIXTURES.md §C), so "take the first k files" cannot define
            # a batch.  Instead the batch is defined by an lsn CUTOFF:
            # the k-th smallest pending max_lsn.  Every pending file
            # whose range dips at-or-below the cutoff is read (nothing
            # below the new high-watermark is ever skipped); rows above
            # the cutoff inside those files defer to later epochs via
            # the (hwm, cutoff] filter.  Progress is guaranteed — the
            # cutoff is always a pending max_lsn > hwm — and batch size
            # stays ~k segments regardless of how redeliveries
            # interleave (a naive fixpoint expansion cascades into one
            # giant batch when every segment contains redelivered rows).
            maxes = sorted(s.max_lsn for s in segs)
            cutoff = maxes[min(max_segments_per_part, len(maxes)) - 1]
        take = [s for s in segs if s.min_lsn <= cutoff]
        take.sort(key=lambda s: (s.min_lsn, s.path))
        chosen += take
        cutoffs[part] = cutoff
    return chosen, cutoffs


def read_batch(
    spark: SparkSession,
    segments: list[Segment],
    offsets: dict[int, int],
    cutoffs: dict[int, int],
) -> DataFrame:
    """One pushdown-friendly scan of the selected segments, bounded to
    (hwm, cutoff] per source partition."""
    schema = batch_schema(segments)
    df = spark.read.schema(schema).parquet(*[s.path for s in segments])
    # one-parse SQL text (same rationale as dedupe.hwm_predicate)
    ceil_pred = F.expr(
        " OR ".join(
            f"(src_part = {int(part)} AND lsn <= {int(hi)})"
            for part, hi in sorted(cutoffs.items())
        )
    )
    # NULL-envelope rows (NULL lsn or src_part) would make the bounds
    # predicate evaluate to SQL NULL and silently vanish before the
    # validity split — let them through so validate.py can quarantine
    # them (rows are quarantined, never dropped).  Plain OR of pushable
    # leaves: parquet row-group pruning on lsn still applies (null_count
    # is 0 in well-formed segments, so IS NULL prunes with the stats).
    # Semantics: quarantine of NULL-envelope rows is AT-LEAST-ONCE — a
    # row with no log position cannot be watermarked, so if its segment
    # is read by several epochs (interleaved redeliveries) each of those
    # epochs re-quarantines it.  Dead letters are an audit surface, not
    # a ledger; consumers dedupe if they need exactly-once counts.
    bounds = (hwm_predicate(offsets) & ceil_pred) | F.col("lsn").isNull() | F.col(
        "src_part"
    ).isNull()
    return df.filter(bounds)
