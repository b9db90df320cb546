"""Binary payload column end-to-end (round-5 verdict item #7): a
``media binary`` column rides the full lifecycle — mid-stream additive
arrival, CDC ingest + LWW resolve, MoR delta fold, rename under the
id-stable evolution rules, and the driver-side serving lookup — so the
type system's ``binary`` support is proven, not implied."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stellar_ingest.cdc.runner import run_increment
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.maintain import fold_deltas
from stellar_ingest.lake.read import lookup_fast, read_live, scan
from stellar_ingest.verify.fingerprint import table_fingerprint

from .helpers import ts as _ts


def _media(conv: str, turn: int) -> bytes:
    """Deterministic fake media payload (no image libs in the sandbox —
    the bytes are opaque to the engine, which is the point)."""
    return hashlib.sha256(f"{conv}/{turn}".encode()).digest() * 4


def _write_seg(path, rows, *, with_media: bool):
    path.mkdir(parents=True)
    cols = {
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "src_part": pa.array([r[1] for r in rows], pa.int32()),
        "op": pa.array([r[2] for r in rows]),
        "conv_id": pa.array([r[3] for r in rows]),
        "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
        "role": pa.array(["user"] * len(rows)),
        "text": pa.array([r[5] for r in rows]),
        "ts": pa.array([_ts(r[0]) for r in rows], pa.timestamp("us")),
    }
    if with_media:
        cols["media"] = pa.array([r[6] for r in rows], pa.binary())
    pq.write_table(pa.table(cols), path / "s.parquet")


@pytest.fixture()
def media_ledger(tmp_path):
    """Era 1 (seg 0): no media column.  Era 2 (segs 1-2): media arrives
    mid-stream, including an update that REPLACES an existing turn's
    media and a tombstone."""
    led = tmp_path / "ledger" / "part=0"
    _write_seg(
        led / "seg=0",
        [
            (1, 0, "U", "c1", 0, "hello"),
            (2, 0, "U", "c1", 1, "world"),
            (3, 0, "U", "c2", 0, "other"),
        ],
        with_media=False,
    )
    _write_seg(
        led / "seg=1",
        [
            (4, 0, "U", "c1", 0, "hello+img", _media("c1", 0)),
            (5, 0, "U", "c3", 0, "new", _media("c3", 0)),
        ],
        with_media=True,
    )
    _write_seg(
        led / "seg=2",
        [
            (6, 0, "U", "c1", 0, "hello+img2", _media("c1", 99)),
            (7, 0, "D", "c2", 0, None, None),
        ],
        with_media=True,
    )
    return str(tmp_path / "ledger")


def test_binary_column_full_lifecycle(spark, media_ledger, tmp_path):
    root = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    # one segment per epoch: the media column genuinely evolves in
    # mid-stream, and later epochs are MoR deltas (auto mode)
    run_increment(
        spark, media_ledger, root, ck,
        salts=None, num_buckets=4, max_segments_per_part=1,
    )
    t = IceboxTable(root)
    assert [f["type"] for f in t.schema_fields() if f["name"] == "media"] == [
        "binary"
    ]
    ops = [s["operation"] for s in t.snapshots()]
    assert "delta" in ops  # the binary column rode the MoR path

    live = {
        (r["conv_id"], r["turn_idx"]): r
        for r in read_live(spark, t).collect()
    }
    assert set(live) == {("c1", 0), ("c1", 1), ("c3", 0)}
    # LWW on the binary column: lsn 6 replaced lsn 4's media
    assert bytes(live[("c1", 0)]["media"]) == _media("c1", 99)
    assert live[("c1", 1)]["media"] is None  # pre-evolution row: NULL backfill
    assert bytes(live[("c3", 0)]["media"]) == _media("c3", 0)

    fp = table_fingerprint(scan(spark, t))

    # driver-side serving lookup returns the same bytes (pyarrow path)
    pf = lookup_fast(spark, t, "c1").set_index("turn_idx")
    assert bytes(pf.loc[0, "media"]) == _media("c1", 99)
    assert pf.loc[1, "media"] is None

    # fold the deltas: binary payloads survive the rewrite byte-for-byte
    assert fold_deltas(spark, t, min_delta_commits=1) is not None
    assert table_fingerprint(scan(spark, t)) == fp
    pf2 = lookup_fast(spark, t, "c1").set_index("turn_idx")
    assert bytes(pf2.loc[0, "media"]) == _media("c1", 99)

    # rename under id-stable evolution: values keep reading (by column
    # id) through both the Spark scan and the pyarrow serving path.
    # (`media` is not a declared-changelog column, so rename is legal.)
    t.rename_column("media", "media_blob")
    live2 = {
        (r["conv_id"], r["turn_idx"]): r for r in read_live(spark, t).collect()
    }
    assert bytes(live2[("c1", 0)]["media_blob"]) == _media("c1", 99)
    pf3 = lookup_fast(spark, t, "c1").set_index("turn_idx")
    assert bytes(pf3.loc[0, "media_blob"]) == _media("c1", 99)


def test_binary_replay_batch_split_invariance(spark, media_ledger, tmp_path):
    """Different epoch splits reconverge byte-identically with the
    binary column in play (the replay contract extends to binary)."""
    fps = []
    for i, mx in enumerate((1, None)):
        root = str(tmp_path / f"t{i}")
        run_increment(
            spark, media_ledger, root, str(tmp_path / f"ck{i}"),
            salts=None, num_buckets=4, max_segments_per_part=mx,
        )
        fps.append(table_fingerprint(scan(spark, IceboxTable(root))))
    assert fps[0] == fps[1]
