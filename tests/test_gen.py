"""Generator contract tests (FIXTURES.md §C): determinism, uniqueness,
op ordering, duplicates, out-of-order ts, era-based schema."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stellar_ingest.gen.changelog import gen_events, keyspace, write_ledger


@pytest.fixture(scope="module")
def events(spark):
    return gen_events(spark, 40, parts=4, seed=42).cache()


def test_deterministic(spark, events):
    again = gen_events(spark, 40, parts=4, seed=42)
    assert events.exceptAll(again).isEmpty() and again.exceptAll(events).isEmpty()


def test_lsn_unique_and_inserts_first(events):
    base = events.filter(F.col("seg_shift") == 0)
    n = base.count()
    assert base.select("lsn").distinct().count() == n
    assert base.select("src_part", "lsn").distinct().count() == n
    # every U/D has an earlier I for its key
    ins = base.filter(F.col("op") == "I").select(
        "conv_id", "turn_idx", F.col("lsn").alias("ins_lsn")
    )
    upd = base.filter(F.col("op") != "I")
    joined = upd.join(ins, ["conv_id", "turn_idx"], "left")
    assert joined.filter(F.col("ins_lsn").isNull() | (F.col("ins_lsn") >= F.col("lsn"))).count() == 0


def test_mix_and_anomalies(events):
    base = events.filter(F.col("seg_shift") == 0)
    n = base.count()
    ops = {r["op"]: r["count"] for r in base.groupBy("op").count().collect()}
    assert ops["I"] > ops["U"] > ops.get("D", 0) > 0
    dups = events.filter(F.col("seg_shift") > 0).count()
    assert 0 < dups < 0.05 * n
    # out-of-order ts: some row has ts earlier than a lower-lsn row's ts
    jittered = base.filter(
        F.unix_timestamp("ts") - 1767225600 < F.col("lsn")
    ).count()
    assert 0 < jittered < 0.2 * n


def test_ledger_layout_and_eras(spark, events, tmp_path):
    out = str(tmp_path / "ledger")
    ks = keyspace(40)
    write_ledger(events, out, n_convs=40, seg_span=ks // 2)
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert len(parts) == 4
    # era-1 files physically lack `tool`
    import pyarrow.parquet as pq

    era1_cols, era3_cols = None, None
    for root, _d, files in os.walk(out):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, fn))
            names = set(pf.schema_arrow.names)
            md = pf.metadata.row_group(0).column(0).statistics
            if "tool_version" in names:
                era3_cols = names
            elif "tool" not in names:
                era1_cols = names
    assert era1_cols is not None and "tool" not in era1_cols
    assert era3_cols is not None and {"tool", "tool_version"} <= era3_cols
