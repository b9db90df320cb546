"""Skew × merge-on-read bench: sustained MoR apply of a SKEWED update
stream (≈50% of each epoch's events hit ONE (conv_id, turn_idx) key)
into a preloaded table — salted vs unsalted vs auto resolve window.

The MoR epoch's only shuffle is the in-batch LWW window; with a whale
key, the unsalted window funnels half the batch through one task while
salting spreads it over S partitions (cdc/resolve.py).  This measures
that difference at the epoch level and checks fingerprint equality.

Usage: python bench/skew_mor.py [n_convs] [events_per_epoch] [epochs]
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_ingest.cdc.runner import backfill, run_increment
from stellar_ingest.gen.changelog import (
    append_update_segment,
    gen_update_stream,
    generate_ledger,
    keyspace,
)
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.read import scan
from stellar_ingest.session import get_spark
from stellar_ingest.verify.fingerprint import table_fingerprint


def whale_stream(spark, n_convs, *, n_events, lsn_base, parts):
    """50% uniform updates over the keyspace + 50% on one hot key."""
    half = n_events // 2
    uni = gen_update_stream(
        spark, n_convs, n_events=half, lsn_base=lsn_base, parts=parts
    )
    hot = spark.range(half).select(
        (F.lit(int(lsn_base) + half) + F.col("id")).alias("lsn"),
        F.lit(0).cast("int").alias("src_part"),
        F.lit("U").alias("op"),
        F.lit("conv000000").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.format_string("whale/u%d", F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("string").alias("tool_version"),
        F.timestamp_seconds(F.lit(1767225600 + int(lsn_base)) + F.col("id")).alias("ts"),
    )
    return uni.unionByName(hot)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    parts = 4
    spark = get_spark("skew-mor", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="skewmor-", dir="/dev/shm")
    ks = keyspace(n_convs)

    base_ledger = f"{work}/base"
    generate_ledger(spark, base_ledger, n_convs=n_convs, parts=parts, seg_span=ks)

    results = {}
    for tag, salts in [("plain", None), ("salted", 8), ("auto", "auto")]:
        ledger = f"{work}/led_{tag}"
        os.system(f"cp -r {base_ledger} {ledger}")
        t_root, ck = f"{work}/t_{tag}", f"{work}/ck_{tag}"
        backfill(spark, ledger, t_root, ck, salts=None, num_buckets=32)
        # updates must start ABOVE the preload's high-watermarks (the
        # ledger's lsn space is much larger than keyspace())
        from stellar_ingest.cdc import checkpoint as ckpt

        base0 = max(ckpt.load(ck)["offsets"].values()) + 1
        rates = []
        for e in range(epochs):
            upd = whale_stream(
                spark, n_convs,
                n_events=per_epoch, lsn_base=base0 + e * 2 * per_epoch,
                parts=parts,
            )
            append_update_segment(upd, ledger, seg_no=100 + e)
            t0 = time.monotonic()
            recs = run_increment(
                spark, ledger, t_root, ck,
                max_epochs=1, salts=salts, num_buckets=32, mode="mor",
                salt_threshold=100_000,
            )
            dt = time.monotonic() - t0
            rows = sum(r["rows"] for r in recs)
            rates.append(rows / dt)
        fp = table_fingerprint(scan(spark, IceboxTable(t_root)))
        results[tag] = fp
        print(
            json.dumps(
                {
                    "mode": tag,
                    "per_epoch_ev_s": [round(r) for r in rates],
                    "mean_ev_s": round(sum(rates) / len(rates)),
                }
            )
        )
    assert results["plain"] == results["salted"] == results["auto"], (
        "fingerprint divergence across salting modes!"
    )
    print(json.dumps({"fingerprints_equal": True}))


if __name__ == "__main__":
    main()
