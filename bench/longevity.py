"""Longevity soak bench: sustained MoR loop WITH vs WITHOUT in-loop
retention (expire_every/gc_every, cdc/runner.py) — evidence that the
retention hook keeps per-epoch driver metadata cost FLAT and the
metadata directory bounded over an unbounded epoch count.

Protocol: one ledger of ~N_EPOCHS tiny segments per part; drain it one
segment per part per epoch (mode=auto → epoch 1 cow, rest MoR with the
auto fold policy).  After every epoch we record metadata.json size, the
metadata dir file count, and the epoch wall from the lineage records.
Run A: no retention.  Run B: expire_every=5 keep_last=3 gc_every=7.

Usage: python bench/longevity.py [n_convs] [epochs]
Prints one JSON line per run + a per-decile curve.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from stellar_ingest.cdc.runner import run_increment
from stellar_ingest.gen.changelog import gen_events, keyspace, write_ledger
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.read import scan
from stellar_ingest.session import get_spark
from stellar_ingest.verify.fingerprint import table_fingerprint


def meta_stats(table_root: str) -> dict:
    t = IceboxTable(table_root)
    v = t._version()
    mpath = os.path.join(t.meta_dir, f"v{v}.metadata.json")
    return {
        "metadata_json_bytes": os.path.getsize(mpath),
        "meta_dir_files": len(os.listdir(t.meta_dir)),
        "snapshots": len(t.snapshots()),
        "data_files_on_disk": sum(
            1
            for _r, _d, fs in os.walk(t.data_dir)
            for f in fs
            if f.endswith(".parquet")
        ),
    }


def run(tag: str, ledger: str, root: str, retention: bool) -> dict:
    t_root, ck = f"{root}/t_{tag}", f"{root}/ck_{tag}"
    spark = get_spark(f"longevity-{tag}", cores=8, shuffle_partitions=8)
    curve = []
    kw = dict(max_segments_per_part=1, salts=None, num_buckets=8)
    if retention:
        kw.update(expire_every=5, keep_last=3, gc_every=7, gc_grace_ms=0)
    walls = []
    while True:
        recs = run_increment(spark, ledger, t_root, ck, max_epochs=1, **kw)
        if not recs:
            break
        walls.append(max(r["wall_ms"] for r in recs))
        curve.append(meta_stats(t_root))
    fp = table_fingerprint(scan(spark, IceboxTable(t_root)))
    n = len(curve)
    deciles = [curve[min(n - 1, (i * n) // 10)] for i in range(1, 11)]
    wall_deciles = [
        round(walls[min(n - 1, (i * n) // 10)], 1) for i in range(1, 11)
    ]
    out = {
        "tag": tag,
        "epochs": n,
        "fingerprint": fp,
        "final": curve[-1],
        "decile_metadata_bytes": [d["metadata_json_bytes"] for d in deciles],
        "decile_meta_dir_files": [d["meta_dir_files"] for d in deciles],
        "decile_snapshots": [d["snapshots"] for d in deciles],
        "decile_data_files": [d["data_files_on_disk"] for d in deciles],
        "decile_wall_ms": wall_deciles,
        "mean_wall_first20_ms": round(sum(walls[:20]) / max(1, len(walls[:20])), 1),
        "mean_wall_last20_ms": round(sum(walls[-20:]) / max(1, len(walls[-20:])), 1),
    }
    print(json.dumps(out))
    return out


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    work = tempfile.mkdtemp(prefix="longevity-")
    spark = get_spark("longevity-gen", cores=8, shuffle_partitions=8)
    ks = keyspace(n_convs)
    ledger = f"{work}/ledger"
    ev = gen_events(spark, n_convs, parts=2, seed=11)
    write_ledger(ev, ledger, n_convs=n_convs, seg_span=max(1, (3 * ks) // n_epochs))
    a = run("none", ledger, work, retention=False)
    b = run("retained", ledger, work, retention=True)
    assert a["fingerprint"] == b["fingerprint"], "retention changed table state!"
    print(
        json.dumps(
            {
                "fingerprints_equal": True,
                "metadata_bytes_unbounded_vs_bounded": [
                    a["final"]["metadata_json_bytes"],
                    b["final"]["metadata_json_bytes"],
                ],
                "meta_dir_files_unbounded_vs_bounded": [
                    a["final"]["meta_dir_files"],
                    b["final"]["meta_dir_files"],
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
