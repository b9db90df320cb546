"""Round-5 hardening (ADVICE.md items): rename × ongoing ingest,
legacy schema_id backfill, streaming quarantine replay, noop-commit
and quarantine-pruning edge cases."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellar_ingest.cdc.runner import _prune_quarantine, run_increment
from stellar_ingest.gen.changelog import gen_events, keyspace, write_ledger
from stellar_ingest.lake.core import IceboxTable, fields_to_struct
from stellar_ingest.lake.merge import merge_apply
from stellar_ingest.lake.read import read_live, scan
from stellar_ingest.lake.write import append
from stellar_ingest.schema import (
    TABLE_SCHEMA,
    align_renames,
    ensure_table_schema,
    table_schema_for,
)

from .helpers import ts


def _rows(spark, items, schema=TABLE_SCHEMA):
    data = [
        (c, t, r, x, tool, ts(sec), ts(sec), lsn, sp, op)
        for (c, t, r, x, tool, sec, lsn, sp, op) in items
    ]
    return spark.createDataFrame(data, schema)


# ---------------------------------------------------------------------------
# ADVICE #1: renaming a changelog-fed column must not split data
# ---------------------------------------------------------------------------


def test_rename_changelog_column_survives_ongoing_ingest(spark, tmp_path):
    """Rename `role` → `speaker` BETWEEN ingest epochs while the ledger
    keeps sending `role`: later epochs must keep feeding the renamed
    column (no fresh-id duplicate, no half-populated split)."""
    n_convs = 10
    ks = keyspace(n_convs)
    ev = gen_events(spark, n_convs, parts=2, seed=7)
    write_ledger(ev, str(tmp_path / "ledger"), n_convs=n_convs, seg_span=ks // 2)
    t_root, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    # epoch 1 only, then rename, then drain the rest
    run_increment(
        spark, str(tmp_path / "ledger"), t_root, ck,
        max_segments_per_part=1, max_epochs=1, salts=None,
    )
    table = IceboxTable(t_root)
    table.rename_column("role", "speaker")
    run_increment(spark, str(tmp_path / "ledger"), t_root, ck, salts=None)
    table = IceboxTable(t_root)
    names = [f["name"] for f in table.schema_fields()]
    assert "speaker" in names and "role" not in names
    assert len(names) == len(set(names))  # no fresh-id duplicate added
    live = read_live(spark, table)
    # every live row has its role value, under the new name, across eras
    assert live.filter(F.col("speaker").isNull()).count() == 0
    # values equal the golden run on an un-renamed table
    g_root, g_ck = str(tmp_path / "g"), str(tmp_path / "gck")
    run_increment(spark, str(tmp_path / "ledger"), g_root, g_ck, salts=None)
    golden = read_live(spark, IceboxTable(g_root)).withColumnRenamed(
        "role", "speaker"
    )
    assert live.select(*golden.columns).exceptAll(golden).count() == 0
    assert golden.exceptAll(live.select(*golden.columns)).count() == 0


def test_rename_map_and_align_guards(spark, tmp_table):
    t = IceboxTable.create(tmp_table, TABLE_SCHEMA, num_buckets=2)
    assert t.rename_map() == {}
    t.rename_column("role", "speaker")
    assert t.rename_map() == {"role": "speaker"}
    # drop then re-add the OLD name: the fresh-id binding of "role" wins,
    # the stale mapping disappears
    t.rename_column("tool", "tool2")
    t.drop_column("tool2")
    t.evolve_schema(T.StructType([T.StructField("tool", T.StringType(), True)]))
    assert t.rename_map() == {"role": "speaker"}
    df = spark.createDataFrame([("u", "x")], "role string, text string")
    out = align_renames(t, df)
    assert out.columns == ["speaker", "text"]
    both = spark.createDataFrame([("u", "v")], "role string, speaker string")
    with pytest.raises(ValueError, match="both the pre-rename"):
        align_renames(t, both)
    # ensure_table_schema refuses unaligned old names outright
    with pytest.raises(ValueError, match="pre-rename names"):
        ensure_table_schema(
            t, T.StructType([T.StructField("role", T.StringType(), True)])
        )


# ---------------------------------------------------------------------------
# ADVICE #2: legacy (unstamped) manifest entries vs non-additive evolution
# ---------------------------------------------------------------------------


def _strip_schema_ids(table: IceboxTable) -> int:
    """Simulate pre-round-4 files: remove schema_id from every live
    manifest entry."""
    ml = table.manifest_list(table.metadata()["current_snapshot_id"])
    n = 0
    for ref in ml.values():
        p = os.path.join(table.meta_dir, ref["manifest"])
        with open(p) as fh:
            m = json.load(fh)
        for e in m["files"]:
            n += int("schema_id" in e)
            e.pop("schema_id", None)
        with open(p, "w") as fh:
            json.dump(m, fh)
    return n


def test_backfill_stamps_legacy_files_on_rename(spark, tmp_table):
    t = IceboxTable.create(tmp_table, TABLE_SCHEMA, num_buckets=4)
    append(
        spark, t,
        _rows(spark, [("c1", 0, "user", "hello", None, 1, 1, 0, "U"),
                      ("c2", 0, "assistant", "hi", None, 2, 2, 0, "U")]),
    )
    assert _strip_schema_ids(t) > 0
    t.rename_column("role", "speaker")
    # entries were stamped, so the id-aligned path reads old values
    assert all("schema_id" in e for e in t.files())
    got = {r["conv_id"]: r["speaker"] for r in read_live(spark, t).collect()}
    assert got == {"c1": "user", "c2": "assistant"}  # NOT NULLs


def test_backfill_refuses_when_history_already_nonadditive(spark, tmp_table):
    t = IceboxTable.create(tmp_table, TABLE_SCHEMA, num_buckets=4)
    append(spark, t, _rows(spark, [("c1", 0, "user", "x", None, 1, 1, 0, "U")]))
    t.rename_column("role", "speaker")  # stamps + renames (fine)
    _strip_schema_ids(t)  # unstamped files under a non-additive history
    with pytest.raises(ValueError, match="unrecoverable"):
        t.rename_column("text", "body")


# ---------------------------------------------------------------------------
# ADVICE #3: merge_apply skip_if_noop on an EMPTY table
# ---------------------------------------------------------------------------


def test_merge_apply_skip_noop_on_empty_table(spark, tmp_table):
    t = IceboxTable.create(tmp_table, TABLE_SCHEMA, num_buckets=4)
    empty = spark.createDataFrame(
        [], table_schema_for(TABLE_SCHEMA)
    )
    # changelog-shaped empty batch
    from stellar_ingest.schema import CHANGELOG_SCHEMA

    empty = spark.createDataFrame([], CHANGELOG_SCHEMA)
    sid = merge_apply(spark, t, empty, skip_if_noop=True)
    assert sid is None
    assert t.snapshots() == []  # no empty snapshot minted


# ---------------------------------------------------------------------------
# ADVICE #4: streaming quarantine survives the commit→write crash window
# ---------------------------------------------------------------------------


def test_streaming_replay_rewrites_lost_quarantine(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stellar_ingest.streaming.pipeline import run_streaming

    from .helpers import ts as _ts

    seg = tmp_path / "ledger" / "part=0" / "seg=0"
    seg.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "lsn": pa.array([1, 2, 3], pa.int64()),
                "src_part": pa.array([0, 0, 0], pa.int32()),
                "op": ["I", None, "I"],  # lsn 2 → quarantine
                "conv_id": ["c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 0], pa.int32()),
                "role": ["user"] * 3,
                "text": ["ok1", "bad", "ok2"],
                "ts": pa.array([_ts(1), _ts(2), _ts(3)], pa.timestamp("us")),
            }
        ),
        seg / "s.parquet",
    )
    ck = str(tmp_path / "ck")
    run_streaming(spark, str(tmp_path / "ledger"), str(tmp_path / "t"), ck, num_buckets=4)
    qdir = tmp_path / "ck" / "quarantine" / "ss_batch=0"
    assert qdir.exists()
    # simulate a crash BETWEEN snapshot commit and quarantine write:
    # quarantine lost, SS checkpoint lost → the batch replays
    shutil.rmtree(qdir)
    shutil.rmtree(tmp_path / "ck" / "ss")
    t = IceboxTable(str(tmp_path / "t"))
    snaps_before = len(t.snapshots())
    run_streaming(spark, str(tmp_path / "ledger"), str(tmp_path / "t"), ck, num_buckets=4)
    assert len(t.snapshots()) == snaps_before  # fence: no double apply
    dead = spark.read.parquet(str(qdir))  # re-derived, not lost
    assert {r["lsn"] for r in dead.collect()} == {2}


# ---------------------------------------------------------------------------
# ADVICE #5: quarantine pruning treats epoch= / ss_batch= independently
# ---------------------------------------------------------------------------


def test_prune_quarantine_namespaces_independent(tmp_path):
    q = tmp_path / "quarantine"
    for d in ["epoch=1", "epoch=2", "epoch=3", "ss_batch=10", "ss_batch=11",
              "ss_batch=12", "junk"]:
        (q / d).mkdir(parents=True)
    n = _prune_quarantine(str(tmp_path), keep=2)
    assert n == 2
    left = sorted(os.listdir(q))
    assert left == ["epoch=2", "epoch=3", "junk", "ss_batch=11", "ss_batch=12"]
