"""Relational core operators + their oracle-verified query builders
(SURVEY.md §2.2/§2.6/§2.7: ops 11-14, 42, 44-46).

Each ``q_*`` builder takes (spark, sf_dir) and returns a DataFrame whose
column names/types line up exactly with the ``ORACLE`` SQL DuckDB runs
on the same parquet — that pairing is the correctness harness
(__spark_entry__.py contract).

Plan notes: every query here is a single-scan narrow plan — projections
and filters push into the parquet reader (verify: `PushedFilters` /
`ReadSchema` in `.explain("formatted")`); sorts/limits compile to
`TakeOrderedAndProject`, set ops to hash aggregates/joins that AQE
sizes at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: per-session memo of the base-table DataFrames (logical plans —
#: METADATA only, never results: no .cache()/persist, every action still
#: computes from the parquet inputs).  Every spark.read.parquet call
#: re-infers the schema from footers and re-lists the file (~15-90 ms
#: per table on this host), and a multi-table query build pays it once
#: per table per build.  A DataFrame is an immutable plan, so returning
#: the same object to every builder is safe — transformations mint new
#: frames.  The fixture dirs are immutable (read-only testdata), so the
#: frozen file listing cannot go stale within a session.  Keyed by
#: applicationId so a new session (or driver rerun) re-reads.
_TBL_CACHE: dict[tuple[str, str], DataFrame] = {}
_TBL_CACHE_MAX = 1024


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    df = _TBL_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if len(_TBL_CACHE) < _TBL_CACHE_MAX:
            _TBL_CACHE[key] = df
    return df


#: parallelism floor: inputs smaller than this per core cannot fill the
#: cluster from the scan alone (a parquet file splits at row-group
#: granularity, and the fixture tables are single files with 1-6 row
#: groups — so compute-heavy operators serialize on 1-6 of 32 cores)
_WIDEN_BYTES_PER_CORE = 8 * 1024 * 1024


def widen(df: DataFrame, parts: int | None = None, *, key_cols: list[str] | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for COMPUTE-heavy operators
    (regex/md5 per doc, 64-dim vector math per row): repartition ONLY
    when the input is too small to split into enough scan tasks (guide
    §2.2/§6 — splits stop at one row group).  The decision is
    driver-side metadata (file sizes, no Spark job): inputs above
    ~8 MB x cores already scan wide, so at production scale this is a
    no-op and no exchange is added.  Results are unchanged — every
    caller feeds an order-insensitive operator (join/groupBy/window).

    ``key_cols``: hash-repartition on these columns instead of
    round-robin, so a downstream window/groupBy keyed the same way
    REUSES the exchange (guide §2.4) instead of adding its own."""
    sc = df.sparkSession.sparkContext
    target = int(parts or sc.defaultParallelism)
    try:
        files = df.inputFiles()
        total = 0
        for f in files:
            p = f[5:] if f.startswith("file:") else f
            if not os.path.isabs(p):
                return df  # non-local source: scan-split sizing unknown
            total += os.path.getsize(p)
    except Exception:  # noqa: BLE001 — unknown source shape: leave as-is
        return df
    if files and total < target * _WIDEN_BYTES_PER_CORE:
        if key_cols:
            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df


def ts_utc(col):
    """Parquet timestamps read back as TIMESTAMP_NTZ in Spark 4; cast to
    session-TZ (UTC) TIMESTAMP so epoch functions accept them — wall
    time is unchanged."""
    return F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp")


def dbl(col):
    """Final-output numeric convention: exact DECIMAL math internally,
    one correctly-rounded cast to DOUBLE at the end — DuckDB's pandas
    bridge renders DECIMAL as float64, so DOUBLE is the only type both
    engines hand to the comparator bit-identically (unscaled values are
    kept < 2^53)."""
    return col.cast("double")


# -- reusable operators ------------------------------------------------------


def project(df: DataFrame, *cols: str, renames: dict[str, str] | None = None) -> DataFrame:
    out = df.select(*cols)
    for old, new in (renames or {}).items():
        out = out.withColumnRenamed(old, new)
    return out


def topk_global(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject — no full sort,
    each partition keeps k, the driver merges (scale-safe for small k)."""
    return df.orderBy(*order_cols).limit(k)


# -- oracle-paired queries ---------------------------------------------------


def q_scan_parquet(spark, sf):
    return (
        tbl(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .filter(F.col("l_shipdate") < "1998-06-01")
    )


def q_scan_csv(spark, sf):
    """CSV round-trip (the reference's native source [PK-high]): export
    the region table to CSV deterministically, read it back typed."""
    import os
    import tempfile

    pdf = tbl(spark, sf, "region").orderBy("r_regionkey").toPandas()
    d = tempfile.mkdtemp(prefix="stellar_csv_")
    path = os.path.join(d, "region.csv")
    pdf.to_csv(path, index=False)
    return spark.read.csv(
        path, header=True, schema="r_regionkey int, r_name string"
    )


def q_scan_json(spark, sf):
    """JSON-lines round-trip (io/scan.py op 2, json form): export nation
    deterministically, read it back typed."""
    import os
    import tempfile

    pdf = tbl(spark, sf, "nation").orderBy("n_nationkey").toPandas()
    d = tempfile.mkdtemp(prefix="stellar_json_")
    path = os.path.join(d, "nation.jsonl")
    pdf[["n_nationkey", "n_name", "n_regionkey"]].to_json(
        path, orient="records", lines=True
    )
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").json(path)


def q_project(spark, sf):
    return project(
        tbl(spark, sf, "customer"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
        renames={"c_mktsegment": "segment"},
    )


def q_filter_pred(spark, sf):
    return tbl(spark, sf, "orders").filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 1000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


def q_derive(spark, sf):
    li = tbl(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dbl(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("net_price"),
        (F.col("l_quantity") > 25).alias("bulk"),
    )


def q_cast_types(spark, sf):
    o = tbl(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        dbl(F.col("o_totalprice").cast("decimal(12,2)")).alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        # DATE rendered as string: DuckDB's pandas bridge widens DATE to
        # datetime64, Spark keeps date objects — strings compare cleanly
        F.col("o_orderdate").cast("date").cast("string").alias("odate"),
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
    )


def q_sort_global(spark, sf):
    return (
        tbl(spark, sf, "supplier")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q_topk_global(spark, sf):
    return topk_global(
        tbl(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    )


def q_set_union(spark, sf):
    c = tbl(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


def q_set_except(spark, sf):
    cust_nations = tbl(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = tbl(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.distinct().exceptAll(supp_nations.distinct())


def q_distinct_rows(spark, sf):
    return tbl(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


ORACLE = {
    "scan_parquet": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-06-01'
    """,
    "scan_csv": "SELECT r_regionkey, r_name FROM region",
    "scan_json": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "project": "SELECT c_custkey, c_name, c_mktsegment AS segment FROM customer",
    "filter_pred": """
        SELECT * FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "derive": """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
               l_quantity > 25 AS bulk
        FROM lineitem
    """,
    "cast_types": """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
               TRY_CAST(o_orderpriority AS INT) AS prio_int
        FROM orders
    """,
    "sort_global": """
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        ORDER BY s_acctbal DESC, s_suppkey
    """,
    "topk_global": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "set_union": """
        SELECT DISTINCT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL SELECT s_nationkey FROM supplier)
    """,
    "set_except": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "distinct_rows": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
}

QUERIES = {
    "scan_parquet": q_scan_parquet,
    "scan_csv": q_scan_csv,
    "scan_json": q_scan_json,
    "project": q_project,
    "filter_pred": q_filter_pred,
    "derive": q_derive,
    "cast_types": q_cast_types,
    "sort_global": q_sort_global,
    "topk_global": q_topk_global,
    "set_union": q_set_union,
    "set_except": q_set_except,
    "distinct_rows": q_distinct_rows,
}
