"""Idempotent MERGE upsert — two commit modes (SURVEY.md §2 ops
7/68/69/78; BASELINE.json:6 "idempotent MERGE upserts,
key-partitioned"):

- ``merge_apply`` — **copy-on-write**: rewrite touched buckets; epoch
  cost Θ(touched table data).  Best for backfill and read-heavy tables.
- ``delta_apply`` — **merge-on-read**: append the batch's winners as
  delta files; epoch cost Θ(batch).  The steady-state choice — readers
  resolve at scan time (lake/read.py), folds compact on a policy
  (lake/maintain.py::fold_deltas).  Measured at a 13.9M-row table:
  5.7× COW throughput, flat in table size (BENCH/BASELINE.md §r3).

The copy-on-write batch = one plan, two shuffles, one snapshot commit:

1. **Touched buckets** from the batch's keys (tiny distinct collect,
   bounded by num_buckets, never by data size).
2. **Manifest prune**: read only the table files of touched buckets
   (metadata-level partition pruning; untouched files carry into the
   new snapshot unread).
3. **Single-window resolve**: existing rows are re-expressed as
   changelog rows and unioned with the batch; ONE ranking window
   computes last-writer-wins across both at once.  This absorbs
   in-batch LSN dedupe too (duplicate (src_part, lsn) deliveries carry
   identical payloads, so whichever copy ranks first is the same row) —
   saving the separate dropDuplicates shuffle on the hot path.
4. **Rewrite** touched buckets (write-salted for hot buckets), commit.

Deletes: the winning mutation may be a delete → kept as a tombstone row
(_op='D', NULL payload).  Tombstones must persist: dropping them would
let an older-ts update resurrect the key under a different replay batch
split, breaking byte-identical reconvergence (schema.py rationale).

Idempotence: re-applying any batch reproduces the same winners (the
ordering (ts, lsn, src_part) is total), so table state is a pure
function of the set of applied mutations — the replay guarantee.

Scale: shuffle 1 hashes (conv_id, turn_idx) [+salt when the census says
so]; shuffle 2 hashes (bucket, write-salt).  Both keys are fine-grained;
a 1000-executor run changes only partition counts, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cdc.resolve import _desc_order, resolve, to_table_rows
from .core import IceboxTable, fields_to_struct
from .read import scan
from .write import bucket_expr, fused_slot_expr, write_data_files, write_salt


def _existing_as_changelog(existing: DataFrame) -> DataFrame:
    """Stored-table rows → changelog shape so they can compete in the
    same LWW window as incoming mutations."""
    payload = [c for c in existing.columns if not c.startswith("_")]
    cols = [
        F.col("_lsn").alias("lsn"),
        F.col("_src_part").alias("src_part"),
        F.when(F.col("_op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    ]
    cols += [F.col(c) for c in payload if c != "ts"]
    # envelope ts is the LWW key; tombstones have NULL payload ts but a real _ts
    cols.append(F.col("_ts").alias("ts"))
    return existing.select(*cols)


def _observed_quarantined(summary: dict) -> int:
    """Quarantine count bound into the summary by summary_fn (0 when no
    lineage stats ride the commit)."""
    return int((summary.get("lineage") or {}).get("quarantined", 0))


def _project_to_table(
    winners: DataFrame, table: IceboxTable, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Resolved winner rows → the committed table schema (column order +
    NULL-fill for columns evolved after this batch's payload).
    ``extra``: layout columns (__bucket) appended as-is — passing the
    SAME attribute through (rather than recomputing the expression)
    keeps the upstream exchange/sort properties visible to the writer
    in the fused path."""
    struct = fields_to_struct(table.schema_fields())
    return winners.select(
        *[
            F.col(f.name)
            if f.name in winners.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in struct.fields
        ],
        *[F.col(c) for c in extra],
    )


def _fused_winner_rows(
    union: DataFrame, bexpr, num_buckets: int, *, rn_observation=None
) -> DataFrame:
    """Single-exchange LWW resolve + write layout (guide §2.4: two
    operations keyed the same way share one exchange).  ``__bucket`` is
    a deterministic function of ``conv_id``, so hash-partitioning the
    batch ONCE on __bucket both (a) co-locates every (conv_id, turn_idx)
    group — the ranking window's clustering requirement is satisfied by
    this exchange, Catalyst inserts no second one — and (b) is exactly
    the layout the bucketed writer needs.  The window's required sort
    (__bucket, conv_id, turn_idx, ts/lsn/src_part desc) is a superset of
    the writer's (__bucket, conv_id, turn_idx), so the writer's
    in-partition sort is elided too: one exchange + one sort where the
    unfused path paid two of each (plan-asserted in
    tests/test_round6_fused.py).

    Winners are IDENTICAL to resolve(): the window groups are the same
    (adding a function of the key to partitionBy changes nothing) and
    the order inside each group is the same total order.  Only valid
    when LWW salting and write salting are both off — those split keys
    across partitions, which the shared exchange cannot express.

    The exchange hashes ``__slot`` = fused_slot_map(n)[__bucket] into
    EXACTLY n partitions — a perfect 1:1 bucket->partition mapping.
    Hashing raw bucket ids collides (birthday bound: 32 ids into 256
    slots measured 30 non-empty partitions), so two reduce tasks carried
    two buckets each and the write stage's tail ran at ~2x the balanced
    wall (guide §2.5).  ``__slot`` is a pure function of ``__bucket``,
    so adding it to the window key changes no groups, and it leads the
    writer's sort (then is dropped) so the single-Sort elision holds."""
    pre = (
        union.withColumn("__bucket", bexpr)
        .withColumn("__slot", fused_slot_expr(num_buckets))
        .repartition(num_buckets, F.col("__slot"))
    )
    w = Window.partitionBy("__slot", "__bucket", "conv_id", "turn_idx").orderBy(
        *_desc_order()
    )
    ranked = pre.withColumn("__rn", F.row_number().over(w))
    if rn_observation is not None:
        ranked = ranked.observe(rn_observation, F.max("__rn").alias("max_rn"))
    winners = ranked.filter(F.col("__rn") == 1).drop("__rn")
    return to_table_rows(winners, carry_cols=("__bucket", "__slot"))


def merge_apply(
    spark: SparkSession,
    table: IceboxTable,
    batch: DataFrame,
    *,
    salts: int | None = None,
    summary: dict | None = None,
    summary_fn=None,
    rn_observation=None,
    skip_if_noop: bool = False,
) -> int | None:
    """Apply one changelog batch (validated + HWM-filtered) as a
    copy-on-write MERGE; returns the committed snapshot id.

    ``summary_fn``: optional callable evaluated AFTER the batch's action
    ran but BEFORE the commit; its dict is merged into the snapshot
    summary.  The runner uses it to bind the epoch's observed lineage
    stats into the same atomic commit (so a torn commit can re-emit
    lineage from the snapshot alone).

    ``skip_if_noop``: return None WITHOUT committing when the batch
    produced no rows and no quarantine (summary_fn-reported) — the
    streaming adapter uses this for availableNow's trailing empty flush
    batch, whose plan must still execute (state-store contract) but must
    not mint an empty snapshot."""
    meta = table.metadata()
    bcol, nbuckets = meta["bucket_column"], meta["num_buckets"]
    bexpr = bucket_expr(bcol, nbuckets)

    if not table.files():
        # empty table (backfill epoch 1): nothing to prune or carry —
        # skip the touched-bucket discovery pass entirely (one full
        # batch traversal saved on the largest batch of the run)
        touched = None
    else:
        touched = sorted(
            r[0] for r in batch.select(bexpr.alias("__b")).distinct().collect()
        )
        if not touched:
            # the distinct() above was this batch's action — observations
            # attached upstream are filled, so summary_fn is safe to call
            summary = dict(summary or {})
            if summary_fn is not None:
                summary.update(summary_fn())
            if skip_if_noop and not _observed_quarantined(summary):
                return None
            return table.commit(added_files=[], summary=summary, operation="merge")

    existing = scan(spark, table, buckets=touched or [])
    union = batch.unionByName(
        _existing_as_changelog(existing), allowMissingColumns=True
    )
    if (not salts or int(salts) <= 1) and write_salt(batch, nbuckets) == 1:
        rows = _fused_winner_rows(union, bexpr, nbuckets, rn_observation=rn_observation)
        ordered = _project_to_table(rows, table, extra=("__bucket", "__slot"))
        new_files = write_data_files(
            ordered, table, pre_partitioned=True, sort_prefix=("__slot",)
        )
    else:
        winners = resolve(union, salts=salts, rn_observation=rn_observation)
        ordered = _project_to_table(winners, table)
        new_files = write_data_files(ordered.withColumn("__bucket", bexpr), table)
    removed = {e["path"] for e in table.files(buckets=touched)}
    summary = dict(summary or {})
    if summary_fn is not None:
        summary.update(summary_fn())
    if (
        skip_if_noop
        and not new_files
        and not removed
        and not _observed_quarantined(summary)
    ):
        # empty batch into an EMPTY table (touched stayed None so the
        # touched-empty early return above never fired): same contract —
        # the write was the batch's action, but no snapshot is minted
        return None
    return table.commit(
        added_files=new_files,
        removed_paths=removed,
        summary=summary,
        operation="merge",
        # manifest IO stays O(touched): only these buckets' manifests are
        # read+rewritten (touched=None ⇒ initial backfill, derived from
        # the added files)
        touched_buckets=touched,
    )


def delta_apply(
    spark: SparkSession,
    table: IceboxTable,
    batch: DataFrame,
    *,
    salts: int | None = None,
    summary: dict | None = None,
    summary_fn=None,
    rn_observation=None,
    skip_if_noop: bool = False,
) -> int | None:
    """Merge-on-read commit: resolve the batch WITHIN itself and append
    the winners as *delta* files — no table read, no bucket rewrite, no
    touched-bucket discovery.  Epoch cost is Θ(batch) regardless of
    table size, which is what sustained apply into a 10^10-event table
    needs (copy-on-write rewrites every touched bucket, i.e. Θ(table)
    per epoch once batches span all buckets).  Readers resolve LWW
    across base+delta files at scan time (lake/read.py::resolve_stored);
    ``lake/maintain.py::fold_deltas`` compacts buckets back to one
    version per key on a file-count policy — exactly Iceberg's MoR +
    rewrite_data_files split.

    Correctness is the same associativity argument as copy-on-write:
    stored rows are per-batch winners under the total order
    (ts, lsn, src_part), and the read-time window takes the max of the
    per-batch maxes.  Re-applying a batch is logically idempotent too —
    duplicate winner rows are bit-identical, so whichever copy the
    read-time window keeps, the resolved state is unchanged."""
    meta = table.metadata()
    bexpr = bucket_expr(meta["bucket_column"], meta["num_buckets"])
    if (not salts or int(salts) <= 1) and write_salt(batch, meta["num_buckets"]) == 1:
        # fused single-exchange path (see _fused_winner_rows): the
        # Θ(batch) MoR epoch drops from 2 exchanges + 2 sorts to 1 + 1
        rows = _fused_winner_rows(
            batch, bexpr, meta["num_buckets"], rn_observation=rn_observation
        )
        ordered = _project_to_table(rows, table, extra=("__bucket", "__slot"))
        new_files = write_data_files(
            ordered, table, delta=True, pre_partitioned=True, sort_prefix=("__slot",)
        )
    else:
        winners = resolve(batch, salts=salts, rn_observation=rn_observation)
        ordered = _project_to_table(winners, table)
        new_files = write_data_files(
            ordered.withColumn("__bucket", bexpr), table, delta=True
        )
    summary = dict(summary or {})
    if summary_fn is not None:
        # the write above was the batch's action — observations attached
        # upstream are filled, same contract as merge_apply
        summary.update(summary_fn())
    if skip_if_noop and not new_files and not _observed_quarantined(summary):
        return None
    return table.commit(added_files=new_files, summary=summary, operation="delta")
