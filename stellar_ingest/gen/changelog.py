"""Deterministic synthetic changelog generator (SURVEY.md §2 op 4;
FIXTURES.md §C contract).  No external data — the driver instruction —
and no nondeterminism: every value derives from ``xxhash64(seed, ...)``
column expressions, so the same parameters reproduce the same ledger
bit-for-bit on any cluster size.  Fully distributed: ``spark.range`` +
``explode(sequence(...))``, no windows, no driver loops.

Shape (per FIXTURES.md §C):
- op mix ~ I-heavy with updates and ~10% of keys ending in a delete;
- conversation turn counts and per-key mutation counts are long-tailed
  (hot conversations exist by construction → exercises skew salting);
- 2% duplicate (src_part, lsn) re-deliveries land 2 segments later
  (at-least-once delivery → exercises LSN dedupe);
- ~10% of mutations get a negative ts jitter so ts is NOT monotone in
  lsn (exercises (ts, lsn) last-writer-wins);
- segments below ``evo1_lsn`` omit ``tool``; below ``evo2_lsn`` omit
  ``tool_version`` (exercises additive schema evolution + NULL backfill).

lsn construction: key_rank = conv*64 + turn is unique per key; mutation
``v`` of a key gets ``lsn = v*keyspace + key_rank``.  Unique, strictly
increasing per key, and inserts (v=0) globally precede updates — every
U/D references a previously inserted key, per the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_TURNS = 64
BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z


def _h(seed: int, tag: str, *cols):
    return F.xxhash64(F.lit(int(seed)), F.lit(tag), *cols)


def keyspace(n_convs: int) -> int:
    return n_convs * MAX_TURNS


def gen_events(
    spark: SparkSession,
    n_convs: int = 100,
    *,
    parts: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Full changelog as a DataFrame, including duplicate re-deliveries;
    carries helper columns ``seg`` (target segment) and ``part`` (dir)."""
    ks = keyspace(n_convs)
    convs = spark.range(n_convs).select(
        F.col("id").alias("cid"),
        F.format_string("conv%06d", F.col("id")).alias("conv_id"),
    )
    # long-tailed turn counts: 1..8 typical, ~2% of convs get 64
    convs = convs.withColumn(
        "n_turns",
        F.least(
            F.lit(MAX_TURNS),
            1
            + F.pmod(_h(seed, "T", F.col("cid")), F.lit(8)).cast("int")
            + F.when(F.pmod(_h(seed, "TH", F.col("cid")), F.lit(47)) == 0, 56).otherwise(0),
        ),
    )
    keys = convs.select(
        "cid",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    # ~70% of keys never update (m=1); ~28% get 1-2 updates; ~2% are hot
    # (long mutation chains → exercises skew)
    keys = keys.withColumn(
        "m",
        (
            1
            + F.when(
                F.pmod(_h(seed, "M", F.col("cid"), F.col("turn_idx")), F.lit(10)) < 3,
                1 + F.pmod(_h(seed, "M2", F.col("cid"), F.col("turn_idx")), F.lit(2)).cast("int"),
            ).otherwise(0)
            + F.when(
                F.pmod(_h(seed, "MH", F.col("cid"), F.col("turn_idx")), F.lit(101)) < 2,
                20,
            ).otherwise(0)
        ),
    ).withColumn(
        "ends_deleted",
        (F.pmod(_h(seed, "DEL", F.col("cid"), F.col("turn_idx")), F.lit(100)) < 10)
        & (F.col("m") > 1),
    )
    ev = keys.select(
        "cid",
        "conv_id",
        "turn_idx",
        "m",
        "ends_deleted",
        F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("v"),
    )
    key_rank = F.col("cid") * MAX_TURNS + F.col("turn_idx")
    ev = ev.withColumn("lsn", (F.col("v").cast("long") * ks + key_rank).cast("long"))
    ev = ev.withColumn(
        "src_part", F.pmod(F.xxhash64("conv_id"), F.lit(int(parts))).cast("int")
    )
    ev = ev.withColumn(
        "op",
        F.when(F.col("v") == 0, "I")
        .when(F.col("ends_deleted") & (F.col("v") == F.col("m") - 1), "D")
        .otherwise("U"),
    )
    # ts: seconds from base, jittered negative for ~10% of rows so ts is
    # not monotone in lsn (LWW must consult both)
    jitter = F.when(
        F.pmod(_h(seed, "J", F.col("lsn")), F.lit(10)) == 0,
        ks + F.pmod(_h(seed, "JW", F.col("lsn")), F.lit(3 * ks)),
    ).otherwise(F.lit(0))
    ev = ev.withColumn(
        "ts", F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("lsn") - jitter)
    )
    is_del = F.col("op") == "D"
    role = (
        F.when(F.pmod(F.col("turn_idx"), F.lit(5)) == 4, "tool")
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, "user")
        .otherwise("assistant")
    )
    ev = (
        ev.withColumn("role", F.when(is_del, F.lit(None)).otherwise(role))
        .withColumn(
            "text",
            F.when(is_del, F.lit(None)).otherwise(
                F.format_string("%s/t%d/v%d", F.col("conv_id"), F.col("turn_idx"), F.col("v"))
            ),
        )
        .withColumn(
            "tool",
            F.when(is_del | (role != "tool"), F.lit(None)).otherwise(
                F.format_string(
                    "tool_%d", F.pmod(_h(seed, "TL", F.col("lsn")), F.lit(5)).cast("int")
                )
            ),
        )
        .withColumn(
            "tool_version",
            F.when(is_del | (role != "tool"), F.lit(None)).otherwise(F.lit("v1")),
        )
    )
    cols = [
        "lsn",
        "src_part",
        "op",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "tool_version",
        "ts",
    ]
    base = ev.select(*cols).withColumn("seg_shift", F.lit(0))
    dups = (
        ev.filter(F.pmod(_h(seed, "DUP", F.col("lsn")), F.lit(50)) == 0)
        .select(*cols)
        .withColumn("seg_shift", F.lit(2))
    )
    return base.unionByName(dups)


def write_ledger(
    events: DataFrame,
    out_dir: str,
    *,
    n_convs: int,
    evo1_lsn: int | None = None,
    evo2_lsn: int | None = None,
    seg_span: int | None = None,
    lsn_min: int | None = None,
    lsn_max: int | None = None,
) -> None:
    """Materialize (a slice of) the event stream as ledger segments
    ``out_dir/part={p}/seg={k}/*.parquet``, lsn-sorted within files.
    Evolution eras write era-appropriate column subsets (older segments
    physically lack the evolved columns).  Appending later lsn slices
    later models segments arriving over time."""
    ks = keyspace(n_convs)
    evo1 = ks if evo1_lsn is None else evo1_lsn
    evo2 = 2 * ks if evo2_lsn is None else evo2_lsn
    span = seg_span or max(1, ks // 4)
    df = events
    if lsn_min is not None:
        df = df.filter(F.col("lsn") >= lsn_min)
    if lsn_max is not None:
        df = df.filter(F.col("lsn") < lsn_max)
    df = df.withColumn(
        "seg", (F.floor(F.col("lsn") / span) + F.col("seg_shift")).cast("int")
    ).withColumn("part", F.col("src_part"))

    base_cols = ["lsn", "src_part", "op", "conv_id", "turn_idx", "role", "text", "ts"]
    eras = [
        (F.col("lsn") < evo1, base_cols),
        ((F.col("lsn") >= evo1) & (F.col("lsn") < evo2), base_cols + ["tool"]),
        (F.col("lsn") >= evo2, base_cols + ["tool", "tool_version"]),
    ]
    for pred, cols in eras:
        era = df.filter(pred)
        (
            era.repartition("part", "seg")
            .sortWithinPartitions("part", "seg", "lsn")
            .select(*cols, "part", "seg")
            .write.partitionBy("part", "seg")
            .mode("append")
            .parquet(out_dir)
        )


def generate_ledger(
    spark: SparkSession,
    out_dir: str,
    *,
    n_convs: int = 100,
    parts: int = 4,
    seed: int = 42,
    seg_span: int | None = None,
) -> DataFrame:
    """Convenience: one-shot full ledger; returns the event DataFrame."""
    ev = gen_events(spark, n_convs, parts=parts, seed=seed)
    write_ledger(ev, out_dir, n_convs=n_convs, seg_span=seg_span)
    return ev


def gen_update_stream(
    spark: SparkSession,
    n_convs: int,
    *,
    n_events: int,
    lsn_base: int,
    parts: int = 4,
    seed: int = 42,
    preload_seed: int = 42,
) -> DataFrame:
    """Steady-state increment: ``n_events`` update mutations spread
    uniformly over the EXISTING keyspace of a ``gen_events(n_convs,
    seed=preload_seed)`` preload — the sustained-apply shape (every
    epoch touches keys across all buckets, which is exactly what makes
    copy-on-write rewrite the whole table).  turn_idx is drawn within
    each conversation's actual preload turn count (same n_turns formula
    as gen_events), so every update references a previously inserted key
    and the table size stays fixed across epochs.  ``lsn_base`` must
    exceed every previously issued lsn; global lsns are strictly
    increasing, hence increasing per src_part.  Deterministic in
    (seed, lsn_base); same contract as gen_events."""
    ks = keyspace(n_convs)
    df = spark.range(n_events).select(
        (F.lit(int(lsn_base)) + F.col("id")).alias("lsn"),
        F.pmod(_h(seed, "UC", F.col("id") + F.lit(int(lsn_base))), F.lit(n_convs)).alias("cid"),
        F.col("id").alias("i"),
    )
    df = df.withColumn("conv_id", F.format_string("conv%06d", F.col("cid")))
    # the preload's per-conversation turn count (mirror of gen_events)
    n_turns = F.least(
        F.lit(MAX_TURNS),
        1
        + F.pmod(_h(preload_seed, "T", F.col("cid")), F.lit(8)).cast("int")
        + F.when(F.pmod(_h(preload_seed, "TH", F.col("cid")), F.lit(47)) == 0, 56).otherwise(0),
    )
    df = df.withColumn(
        "turn_idx",
        F.pmod(_h(seed, "UT", F.col("lsn")), n_turns).cast("int"),
    ).withColumn(
        "src_part", F.pmod(F.xxhash64("conv_id"), F.lit(int(parts))).cast("int")
    )
    role = F.when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, "user").otherwise("assistant")
    return df.select(
        "lsn",
        "src_part",
        F.lit("U").alias("op"),
        "conv_id",
        F.col("turn_idx"),
        role.alias("role"),
        F.format_string("%s/t%d/u%d", F.col("conv_id"), F.col("turn_idx"), F.col("i")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("string").alias("tool_version"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("lsn")).alias("ts"),
    )


def append_update_segment(
    events: DataFrame, out_dir: str, *, seg_no: int
) -> None:
    """Materialize one increment as ledger segments
    ``out_dir/part={p}/seg={seg_no}/`` (one new segment per source
    partition — the steady drip of a live binlog tail)."""
    (
        events.withColumn("part", F.col("src_part"))
        .withColumn("seg", F.lit(int(seg_no)))
        .repartition("part")
        .sortWithinPartitions("lsn")
        .write.partitionBy("part", "seg")
        .mode("append")
        .parquet(out_dir)
    )
