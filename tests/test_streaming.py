"""Structured Streaming adapter (SURVEY.md §2.9): availableNow drain
through foreachBatch must land the same final state as the batch loop."""

from __future__ import annotations

import pytest

from stellar_ingest.cdc.runner import backfill
from stellar_ingest.gen.changelog import gen_events, keyspace, write_ledger
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.read import read_live
from stellar_ingest.streaming.pipeline import run_streaming
from stellar_ingest.verify.diff import states_equal


@pytest.fixture(scope="module")
def small_ledger(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ss")
    ev = gen_events(spark, 16, parts=2, seed=11)
    # MULTI-era ledger: the stream schema is the union of the footer
    # schemas, so evolved columns (tool, tool_version) flow through and
    # the streaming table must match the batch runner's exactly
    write_ledger(ev, str(root / "ledger"), n_convs=16, seg_span=keyspace(16) // 2)
    return root


def test_streaming_matches_batch(spark, small_ledger):
    root = small_ledger
    run_streaming(
        spark, str(root / "ledger"), str(root / "t_ss"), str(root / "ck_ss"),
        num_buckets=4,
    )
    backfill(
        spark, str(root / "ledger"), str(root / "t_b"), str(root / "ck_b"),
        salts=None, num_buckets=4,
    )
    ss_live = read_live(spark, IceboxTable(str(root / "t_ss")))
    b_live = read_live(spark, IceboxTable(str(root / "t_b")))
    assert ss_live.count() > 0
    assert sorted(ss_live.columns) == sorted(b_live.columns)  # evolved cols present
    assert states_equal(ss_live.select(*sorted(ss_live.columns)),
                        b_live.select(*sorted(b_live.columns)))


def test_streaming_restart_is_idempotent(spark, small_ledger):
    root = small_ledger
    # second availableNow run over the same checkpoint: no new snapshots
    t = IceboxTable(str(root / "t_ss"))
    before = len(t.snapshots())
    run_streaming(
        spark, str(root / "ledger"), str(root / "t_ss"), str(root / "ck_ss"),
        num_buckets=4,
    )
    assert len(t.snapshots()) == before