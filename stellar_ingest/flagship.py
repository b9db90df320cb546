"""Flagship end-to-end slice (SURVEY.md §7 M0, §3.3): synthesize a
deterministic mini-ledger → incremental CDC ingest (dedupe → LWW →
MERGE → epoch-fenced commits, crossing both schema-evolution points) →
read the governed table back → reassemble ordered transcripts.

This is the driver's ``entry()`` smoke target: deterministic seed ⇒
stable row count and schema.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc.runner import run_increment
from .gen.changelog import gen_events, keyspace, write_ledger
from .lake.core import IceboxTable
from .lake.read import read_live


def reassemble_transcripts(live: DataFrame) -> DataFrame:
    """Transcript reassembly (SURVEY.md op 33): turns → ordered array
    under stable (conv_id, turn_idx) ordering."""
    turn = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool")
    )
    return (
        live.groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(turn)).alias("turns"))
        .select(
            "conv_id",
            F.size("turns").alias("n_turns"),
            F.col("turns")[0]["text"].alias("first_text"),
            F.element_at("turns", -1)["text"].alias("last_text"),
            F.concat_ws(
                "\n",
                F.transform(
                    "turns",
                    lambda t: F.concat_ws(": ", t["role"], t["text"]),
                ),
            ).alias("transcript"),
        )
    )


def flagship(
    spark: SparkSession, n_convs: int = 24, *, max_segments_per_part: int = 4
) -> DataFrame:
    work = tempfile.mkdtemp(prefix="stellar_flagship_")
    ledger = f"{work}/ledger"
    ev = gen_events(spark, n_convs, parts=2, seed=42)
    write_ledger(ev, ledger, n_convs=n_convs, seg_span=keyspace(n_convs))
    run_increment(
        spark,
        ledger,
        f"{work}/table",
        f"{work}/checkpoint",
        max_segments_per_part=max_segments_per_part,
        salts=None,
        num_buckets=8,
    )
    live = read_live(spark, IceboxTable(f"{work}/table"))
    return reassemble_transcripts(live).orderBy("conv_id")
