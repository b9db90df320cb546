"""Unit tests for operator helpers (SURVEY.md §2.3) that the oracle
harness exercises only through the registered queries."""

from __future__ import annotations

from stellar_ingest.ops.joins import asof_join

from .helpers import ts


def test_asof_helper_keeps_fact_with_only_later_dims(spark):
    """Regression (round-1 verdict): a fact row whose ONLY dim versions
    are later-dated must survive with NULLs — the ts bound lives in the
    join condition, not a post-join filter."""
    fact = spark.createDataFrame(
        [("k1", ts(100), "f1"), ("k2", ts(100), "f2"), ("k3", ts(100), "f3")],
        "k string, fts timestamp, fval string",
    )
    dim = spark.createDataFrame(
        [
            ("k1", ts(50), "d-old"),
            ("k1", ts(90), "d-new"),
            ("k1", ts(150), "d-future"),
            ("k2", ts(200), "d-only-later"),  # only later-dated versions
        ],
        "k string, dts timestamp, dval string",
    )
    out = asof_join(fact, dim, on="k", fact_ts="fts", dim_ts="dts", dim_cols=["dts", "dval"])
    got = {r["k"]: (r["dval"], r["fval"]) for r in out.collect()}
    assert got["k1"] == ("d-new", "f1")  # latest at-or-before, not future
    assert got["k2"] == (None, "f2")  # survives with NULL dim
    assert got["k3"] == (None, "f3")  # no dim at all
    assert len(got) == 3


def test_transcript_repair_groupedmap(spark):
    """Op 62 (grouped-map applyInPandas): dense re-index + role ffill,
    independent of input partitioning."""
    from stellar_ingest.ops.repair import repair_transcripts

    rows = [
        # conv 1: gappy turn ids (deletes left holes), missing roles
        (1, 0, "user", 0),
        (1, 3, None, 1),
        (1, 7, "assistant", 2),
        (1, 9, None, 3),
        # conv 2: leading NULL role falls back to default
        (2, 5, None, 4),
        (2, 6, "tool", 5),
    ]
    df = spark.createDataFrame(
        [(c, t, r, ts(s)) for c, t, r, s in rows],
        "conv_id long, turn_idx long, role string, ts timestamp",
    ).repartition(4)
    out = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["orig_turn_idx"])
        for r in repair_transcripts(df).collect()
    }
    assert out == {
        (1, 0): ("user", 0),
        (1, 1): ("user", 3),  # ffilled
        (1, 2): ("assistant", 7),
        (1, 3): ("assistant", 9),  # ffilled
        (2, 0): ("user", 5),  # default role
        (2, 1): ("tool", 6),
    }


def test_asof_helper_preserves_duplicate_fact_rows(spark):
    fact = spark.createDataFrame(
        [("k1", ts(100), "same"), ("k1", ts(100), "same")],
        "k string, fts timestamp, fval string",
    )
    dim = spark.createDataFrame(
        [("k1", ts(10), "d")], "k string, dts timestamp, dval string"
    )
    out = asof_join(fact, dim, on="k", fact_ts="fts", dim_ts="dts", dim_cols=["dts", "dval"])
    assert out.count() == 2
