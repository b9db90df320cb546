"""DuckDB oracle mirror (SURVEY.md §5 layer 2): runs every ``queries()``
key side-by-side with its ``oracle_sql()`` and compares row count +
column set + order-insensitive canonical values — the same contract the
driver's CORRECTNESS gate applies, so drift is caught by pytest first.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_NULL = "<NULL>"


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_val(v: Any) -> str:
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return _NULL
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_val(v) for v in row))
    out.sort()
    return out


def compare(spark_df, duck_df: pd.DataFrame) -> dict:
    sp = spark_df.toPandas()
    res: dict = {
        "rows_spark": len(sp),
        "rows_oracle": len(duck_df),
        "cols_spark": sorted(sp.columns),
        "cols_oracle": sorted(duck_df.columns),
    }
    res["rows_match"] = res["rows_spark"] == res["rows_oracle"]
    res["cols_match"] = res["cols_spark"] == res["cols_oracle"]
    if not (res["rows_match"] and res["cols_match"]):
        res["values_match"] = False
        return res
    a, b = canon_frame(sp), canon_frame(duck_df)
    res["values_match"] = a == b
    if not res["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        res["first_diffs"] = diffs[:3]
    return res


def check_key(spark, con, sf_dir: str, name: str, qfn, sql: str | None) -> dict:
    df = qfn(spark, sf_dir)
    if sql is None:
        n = df.count()
        return {"key": name, "mode": "rows_only", "rows_spark": n, "ok": n >= 0}
    duck = con.execute(sql).df()
    res = compare(df, duck)
    res["key"] = name
    res["mode"] = "oracle"
    res["ok"] = res["rows_match"] and res["cols_match"] and res["values_match"]
    return res
