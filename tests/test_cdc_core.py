"""Unit tests: dedupe / LWW resolve (incl. salted two-phase equality) /
validation (SURVEY.md §2 ops 15, 25, 35, 66, 67)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stellar_ingest.cdc.dedupe import dedupe, new_offsets
from stellar_ingest.cdc.resolve import lww_winners, resolve
from stellar_ingest.cdc.validate import split_valid
from stellar_ingest.verify.diff import states_equal

from .helpers import make_changelog


def test_dedupe_hwm_and_duplicates(spark):
    df = make_changelog(
        spark,
        [
            (1, 0, "I", "c1", 0, "user", "a", None, 1),
            (2, 0, "U", "c1", 0, "user", "b", None, 2),
            (2, 0, "U", "c1", 0, "user", "b", None, 2),  # duplicate delivery
            (1, 1, "I", "c2", 0, "user", "c", None, 3),
        ],
    )
    out = dedupe(df, offsets={0: 1})  # part 0 consumed through lsn 1
    rows = {(r["src_part"], r["lsn"]) for r in out.collect()}
    assert rows == {(0, 2), (1, 1)}
    offs = new_offsets(out, {0: 1})
    assert offs == {0: 2, 1: 1}


def test_lww_orders_by_ts_then_lsn(spark):
    df = make_changelog(
        spark,
        [
            (1, 0, "I", "c1", 0, "user", "v0", None, 10),
            (2, 0, "U", "c1", 0, "user", "v1", None, 30),
            (3, 0, "U", "c1", 0, "user", "v2-out-of-order", None, 20),  # older ts, later lsn
            (4, 0, "U", "c1", 1, "user", "t1a", None, 5),
            (5, 0, "U", "c1", 1, "user", "t1b", None, 5),  # ts tie → lsn decides
        ],
    )
    w = {(r["turn_idx"]): r["text"] for r in resolve(df).collect()}
    assert w[0] == "v1"  # ts=30 beats later-lsn ts=20
    assert w[1] == "t1b"  # lsn tiebreak


def test_delete_becomes_tombstone(spark):
    df = make_changelog(
        spark,
        [
            (1, 0, "I", "c1", 0, "user", "x", None, 1),
            (2, 0, "D", "c1", 0, None, None, None, 2),
        ],
    )
    out = resolve(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["_op"] == "D" and r["text"] is None and r["_lsn"] == 2
    assert r["ts"] is None and r["_ts"] is not None


def test_salted_resolve_equals_unsalted(spark):
    rows = []
    for i in range(300):
        # one hot key + scattered keys, shuffled ts
        if i % 2 == 0:
            rows.append((i, i % 3, "U", "hot", 0, "user", f"h{i}", None, (i * 7) % 100))
        else:
            rows.append((i, i % 3, "U", f"c{i%11}", i % 4, "user", f"x{i}", None, (i * 13) % 100))
    df = make_changelog(spark, rows)
    plain = lww_winners(df)
    salted = lww_winners(df, salts=8)
    assert states_equal(plain, salted)


def test_validate_quarantines_bad_rows(spark):
    good = (1, 0, "I", "c1", 0, "user", "ok", None, 1)
    bad_op = (2, 0, "X", "c1", 0, "user", "bad-op", None, 1)
    bad_key = (3, 0, "I", None, 0, "user", "no-key", None, 1)
    bad_role = (4, 0, "I", "c1", 1, "robot", "bad-role", None, 1)
    del_ok = (5, 0, "D", "c1", 2, None, None, None, 2)
    df = spark.createDataFrame(
        [
            (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], __import__("tests.helpers", fromlist=["ts"]).ts(r[8]))
            for r in [good, bad_op, bad_key, bad_role, del_ok]
        ],
        "lsn long, src_part int, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    valid, bad = split_valid(df)
    assert {r["lsn"] for r in valid.collect()} == {1, 5}
    assert {r["lsn"] for r in bad.collect()} == {2, 3, 4}
