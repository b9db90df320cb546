"""Property-based invariants (SURVEY.md §5 layer 4, hypothesis):

- idempotence: applying the same batch twice ≡ once;
- split-commutativity: ANY lsn-prefix partition of a ledger into
  batches yields the same final state;
- delete/re-insert and duplicate/reorder delivery correctness.

Hypothesis drives the *mutation sequences*; the engine applies them via
the real MERGE path on a shared SparkSession.  The oracle is the pandas
LWW reference (tests/helpers.py).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stellar_ingest.cdc.resolve import resolve
from stellar_ingest.lake.core import IceboxTable
from stellar_ingest.lake.merge import merge_apply
from stellar_ingest.lake.read import read_live, scan
from stellar_ingest.schema import CHANGELOG_SCHEMA, TABLE_SCHEMA
from stellar_ingest.verify.diff import states_equal
from stellar_ingest.verify.fingerprint import table_fingerprint

from .helpers import expected_lww_pandas, make_changelog

CONVS = ["cA", "cB"]
TURNS = [0, 1]


@st.composite
def mutation_ledgers(draw):
    """A short ledger over a 2x2 key domain: ops with shuffled ts,
    duplicates appended."""
    n = draw(st.integers(min_value=1, max_value=14))
    rows = []
    for lsn in range(n):
        conv = draw(st.sampled_from(CONVS))
        turn = draw(st.sampled_from(TURNS))
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        sec = draw(st.integers(min_value=0, max_value=20))
        sp = draw(st.sampled_from([0, 1]))
        if op == "D":
            rows.append((lsn, sp, op, conv, turn, None, None, None, sec))
        else:
            rows.append((lsn, sp, op, conv, turn, "user", f"{conv}/t{turn}/l{lsn}", None, sec))
    # duplicate a random subset (same (src_part, lsn) → same payload)
    dup_idx = draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=3))
    rows += [rows[i] for i in dup_idx]
    return rows


def _apply_batches(spark, tmp_root, rows, splits):
    root = f"{tmp_root}/t"
    IceboxTable.create(root, TABLE_SCHEMA, num_buckets=4)
    t = IceboxTable(root)
    prev = 0
    for cut in [*splits, len(rows)]:
        chunk = [r for r in rows[prev:cut]]
        prev = cut
        if not chunk:
            continue
        merge_apply(spark, t, make_changelog(spark, chunk))
    return t


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=mutation_ledgers(), split=st.integers(min_value=0, max_value=14))
def test_split_commutativity_and_oracle(spark, tmp_path_factory, rows, split):
    split = min(split, len(rows))
    d1 = str(tmp_path_factory.mktemp("p1"))
    d2 = str(tmp_path_factory.mktemp("p2"))
    one = _apply_batches(spark, d1, rows, [])
    two = _apply_batches(spark, d2, rows, [split])
    assert table_fingerprint(scan(spark, one)) == table_fingerprint(scan(spark, two))
    # live view matches the pandas LWW oracle
    pdf = pd.DataFrame(
        rows, columns="lsn src_part op conv_id turn_idx role text tool sec".split()
    )
    pdf["ts"] = pdf["sec"]
    exp = expected_lww_pandas(pdf, payload_cols=("text",))
    live = (
        read_live(spark, one)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    exp2 = exp[["conv_id", "turn_idx", "text"]].reset_index(drop=True)
    live = live.reset_index(drop=True)
    live["turn_idx"] = live["turn_idx"].astype("int64")
    exp2["turn_idx"] = exp2["turn_idx"].astype("int64")
    assert live.equals(exp2), f"\nlive:\n{live}\nexpected:\n{exp2}"


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=mutation_ledgers())
def test_idempotent_reapply(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("idem"))
    root = f"{d}/t"
    IceboxTable.create(root, TABLE_SCHEMA, num_buckets=4)
    t = IceboxTable(root)
    batch = make_changelog(spark, rows)
    merge_apply(spark, t, batch)
    fp1 = table_fingerprint(scan(spark, t))
    merge_apply(spark, t, batch)  # replay the SAME batch
    assert table_fingerprint(scan(spark, t)) == fp1


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=mutation_ledgers(), split=st.integers(min_value=0, max_value=14),
       do_expire=st.booleans())
def test_maintenance_interleaving_preserves_state(
    spark, tmp_path_factory, rows, split, do_expire
):
    """Compaction (and optional expiry) between MERGE batches is a
    logical no-op: final fingerprint equals the maintenance-free run."""
    from stellar_ingest.lake.maintain import compact, expire_snapshots

    split = min(split, len(rows))
    d1 = str(tmp_path_factory.mktemp("m1"))
    d2 = str(tmp_path_factory.mktemp("m2"))
    plain = _apply_batches(spark, d1, rows, [split])

    root = f"{d2}/t"
    IceboxTable.create(root, TABLE_SCHEMA, num_buckets=4)
    t = IceboxTable(root)
    prev = 0
    for cut in [split, len(rows)]:
        chunk = rows[prev:cut]
        prev = cut
        if chunk:
            merge_apply(spark, t, make_changelog(spark, chunk))
        compact(spark, t, min_files_per_bucket=1)  # force a rewrite even if tidy
        if do_expire:
            expire_snapshots(t, keep_last=1)
    assert table_fingerprint(scan(spark, t)) == table_fingerprint(scan(spark, plain))
