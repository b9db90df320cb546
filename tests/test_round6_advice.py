"""Round-6 correctness fixes from the round-5 ADVICE file:

1. audit_and_publish's no-quarantine gate survives retention expiring
   intermediate branch snapshots (running ``cum_quarantined`` counter —
   the head alone carries the gate's input);
2. maintenance commits' carried lineage is not double-counted;
3. align_renames raises on rename-CHAIN ambiguity (A→B→C with a batch
   carrying both A and B);
4. dedup-index ingest_batch is idempotent per epoch and a torn
   bands-committed/clusters-missing state is repaired without
   duplicating band rows.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from stellar_ingest.cdc.runner import run_increment
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.maintain import audit_and_publish, compact, expire_snapshots
from stellar_ingest.schema import align_renames

from .conftest import SF_DIR


def _ts(sec):
    return datetime.fromtimestamp(1767225600 + sec, tz=timezone.utc).replace(tzinfo=None)


def _seg(path, lsns, ops, convs, secs):
    path.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "lsn": pa.array(lsns, pa.int64()),
                "src_part": pa.array([0] * len(lsns), pa.int32()),
                "op": ops,
                "conv_id": convs,
                "turn_idx": pa.array([0] * len(lsns), pa.int32()),
                "role": ["user"] * len(lsns),
                "text": ["x"] * len(lsns),
                "ts": pa.array([_ts(s) for s in secs], pa.timestamp("us")),
            }
        ),
        path / "s.parquet",
    )


def test_quarantine_gate_survives_branch_snapshot_expiry(spark, tmp_path):
    """Epoch 1 quarantines a row, epoch 2 is clean; retention then
    expires the epoch-1 branch snapshot.  Pre-fix the audit walk broke
    at the missing parent and summed only the clean head — the bad
    epoch published silently.  The running counter on the head must
    still trip the gate."""
    _seg(tmp_path / "ledger" / "part=0" / "seg=0",
         [1, 2], ["I", None], ["c1", "c1"], [1, 2])  # op NULL → quarantine
    _seg(tmp_path / "ledger" / "part=0" / "seg=1",
         [3, 4], ["I", "I"], ["c2", "c3"], [3, 4])
    root = str(tmp_path / "t")
    run_increment(
        spark, str(tmp_path / "ledger"), root, str(tmp_path / "ck"),
        salts=None, num_buckets=4, branch="staging", max_segments_per_part=1,
    )
    staged = IceboxTable(root, branch="staging")
    assert len(staged.snapshots()) >= 2
    expire_snapshots(staged, keep_last=1)
    t = IceboxTable(root)
    # the intermediate (quarantining) branch snapshot is gone…
    from stellar_ingest.lake.maintain import _branch_chain

    chain, truncated = _branch_chain(t, "staging")
    assert truncated and len(chain) == 1
    # …but the gate still refuses
    with pytest.raises(ValueError, match="quarantined"):
        audit_and_publish(spark, t, "staging")
    assert t.current_snapshot() is None  # main untouched
    out = audit_and_publish(spark, t, "staging", require_no_quarantine=False)
    assert out["quarantined"] == 1


def test_maintenance_carried_lineage_not_double_counted(spark, tmp_path):
    """A compaction/fold carries the parent's lineage summary forward
    (fence repair needs it); the quarantine counter must count the
    epoch once, not once per maintenance commit."""
    _seg(tmp_path / "ledger" / "part=0" / "seg=0",
         [1, 2, 3], ["I", None, "I"], ["c1", "c1", "c2"], [1, 2, 3])
    root = str(tmp_path / "t")
    run_increment(
        spark, str(tmp_path / "ledger"), root, str(tmp_path / "ck"),
        salts=None, num_buckets=4, branch="staging",
    )
    staged = IceboxTable(root, branch="staging")
    head_before = staged.current_snapshot()["summary"]["cum_quarantined"]
    compact(spark, staged, min_files_per_bucket=1)
    head_after = staged.current_snapshot()["summary"]
    assert "maintenance" in head_after  # it IS a maintenance commit
    assert head_after["cum_quarantined"] == head_before == 1
    t = IceboxTable(root)
    out = audit_and_publish(spark, t, "staging", require_no_quarantine=False)
    assert out["quarantined"] == 1  # not 2


def test_align_renames_chain_ambiguity_raises(spark, tmp_path):
    from pyspark.sql import types as T

    from stellar_ingest.lake.write import append

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("_ts", T.TimestampType()),
            T.StructField("_lsn", T.LongType()),
            T.StructField("_src_part", T.IntegerType()),
            T.StructField("_op", T.StringType()),
        ]
    )
    t = IceboxTable.create(str(tmp_path / "t"), schema, num_buckets=4)
    append(
        spark, t,
        spark.createDataFrame(
            [("c1", 0, "user", _ts(1), _ts(1), 1, 0, "U")], schema
        ),
    )
    t.rename_column("role", "speaker")
    t.rename_column("speaker", "voice")
    assert t.rename_map() == {"role": "voice", "speaker": "voice"}
    # batch carrying only ONE historical name still aligns fine
    ok = spark.createDataFrame([("c1", "user")], "conv_id string, role string")
    assert "voice" in align_renames(t, ok).columns
    # batch carrying BOTH historical names is ambiguous → operator error
    bad = spark.createDataFrame(
        [("c1", "user", "assistant")],
        "conv_id string, role string, speaker string",
    )
    with pytest.raises(ValueError, match="multiple historical names"):
        align_renames(t, bad)


def test_ingest_batch_idempotent_and_torn_repair(spark, tmp_path):
    from stellar_ingest.lake.read import scan
    from stellar_ingest.lake.write import append
    from stellar_ingest.ops.dedup import band_signatures
    from stellar_ingest.ops.dedup_index import (
        _tables,
        current_assignments,
        dedup_index_init,
        ingest_batch,
    )

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    d1 = docs.filter(F.col("doc_id") < 150)
    d2 = docs.filter(F.col("doc_id") >= 150)
    root = str(tmp_path / "idx")
    dedup_index_init(root)
    bt, ct = _tables(root)
    m1 = ingest_batch(spark, d1, root, epoch=1)
    assert "already_committed" not in m1
    bands_after_1 = scan(spark, bt).count()
    assign_1 = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in current_assignments(spark, root).collect()
    )
    # blind retry of the SAME epoch: no-op, nothing duplicated
    m1r = ingest_batch(spark, d1, root, epoch=1)
    assert m1r["already_committed"] is True
    assert scan(spark, bt).count() == bands_after_1
    assert (
        sorted(
            (r["doc_id"], r["cluster_id"])
            for r in current_assignments(spark, root).collect()
        )
        == assign_1
    )
    # torn state: epoch 2's BANDS landed (with its epoch marker) but the
    # clusters append did not — the retry must not re-append bands and
    # must still converge to the full-corpus closure
    append(
        spark, bt, band_signatures(d2),
        sort_cols=("doc_id", "band"), summary={"dedup_epoch": 2},
    )
    bands_after_torn = scan(spark, bt).count()
    m2 = ingest_batch(spark, d2, root, epoch=2)
    assert "already_committed" not in m2
    assert scan(spark, bt).count() == bands_after_torn  # no duplicate bands
    from .test_dedup_index import full_rebuild

    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in current_assignments(spark, root).collect()
    )
    assert got == full_rebuild(docs)
