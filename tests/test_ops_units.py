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
