"""Join zoo + oracle-paired queries (SURVEY.md §2.3 ops 16-24).

Strategy notes (verified via .explain in tests/bench):
- dimension joins (region/nation/supplier) are explicitly broadcast —
  at 100 TB the fact side never shuffles for a dim join;
- orders⋈lineitem is a shuffle join on the natural key; AQE picks
  SMJ/SHJ and handles residual skew at runtime;
- the as-of join composes equi-join + window instead of a theta join —
  a BroadcastNestedLoop there would be quadratic at scale;
- range/interval joins keep an equi leg so Catalyst can hash-partition,
  with the range predicate as a post-join filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import tbl


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str,
    dim_ts: str,
    dim_cols: list[str],
    fact_key: str | None = None,
) -> DataFrame:
    """Latest dim state at-or-before each fact row's timestamp
    (SURVEY.md op 23), the same shape as q_join_asof below: the ts bound
    lives IN the join condition (a post-join filter would silently drop
    fact rows whose only dim versions are later-dated — the left join
    matched, so no null-extended row survives the filter), then
    row_number()=1 over desc dim ts keeps the latest match per fact row.
    ``fact_key``: a unique fact row id for the window partition; if
    absent one is synthesized (monotonically_increasing_id), so exact
    duplicate fact rows keep their multiplicity.  Scale: the shuffle key
    is ``on`` — same plan at any cluster size; skewed keys fall to AQE
    skew-join."""
    fid = fact_key or "__fid"
    f = fact if fact_key else fact.withColumn(fid, F.monotonically_increasing_id())
    d = dim.select(on, dim_ts, *[c for c in dim_cols if c not in (on, dim_ts)])
    d = d.toDF(*[c if c == on else f"__dim_{c}" for c in d.columns])
    j = f.join(
        d,
        (f[on] == d[on]) & (F.col(f"__dim_{dim_ts}") <= f[fact_ts]),
        "left",
    ).drop(d[on])
    w = Window.partitionBy(fid).orderBy(F.col(f"__dim_{dim_ts}").desc_nulls_last())
    out = j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    renames = {f"__dim_{c}": c for c in dim_cols if c != on}
    out = out.drop("__rn").withColumnsRenamed(renames)
    if dim_ts not in dim_cols:
        out = out.drop(f"__dim_{dim_ts}")  # ordering column the caller didn't ask for
    return out if fact_key else out.drop("__fid")


# -- oracle-paired queries ---------------------------------------------------


def q_join_inner(spark, sf):
    o = tbl(spark, sf, "orders")
    c = tbl(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


def q_join_broadcast(spark, sf):
    n = tbl(spark, sf, "nation")
    r = tbl(spark, sf, "region")
    c = tbl(spark, sf, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_join_large(spark, sf):
    o = tbl(spark, sf, "orders")
    li = tbl(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_qty"),
        )
    )


def q_join_outer(spark, sf):
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_semi(spark, sf):
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark, sf):
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_join_range(spark, sf):
    """Theta/range join: price bands × parts (broadcast nested loop on a
    tiny literal band table)."""
    p = tbl(spark, sf, "part")
    bands = p.sparkSession.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1500.0), ("high", 1500.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q_join_cross(spark, sf):
    """Cross join (completes the join zoo): region x nation grid with a
    derived same-region flag.  Scale: only ever sane when one side is
    broadcast-tiny — which Catalyst enforces here (BroadcastNestedLoop
    with the 5-row side broadcast)."""
    r = tbl(spark, sf, "region").select("r_regionkey", "r_name")
    n = tbl(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    return n.crossJoin(F.broadcast(r)).select(
        "n_nationkey",
        "r_regionkey",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("home_region"),
    )


def q_join_dim_supplier(spark, sf):
    """Supplier dimension rollup (covers the last unused fixture table):
    broadcast nation dim, per-nation supplier count + account balance
    stats — the canonical star-schema dim join shape."""
    s = tbl(spark, sf, "supplier")
    n = tbl(spark, sf, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double"),
                2,
            ).alias("sum_acctbal"),
        )
    )


def q_join_asof(spark, sf):
    """As-of join (op 23): for each event, the user's most recent order
    at-or-before the event time (orders as the versioned 'dim')."""
    e = tbl(spark, sf, "events").select(
        "event_id", F.col("user_id"), F.col("ts").alias("ev_ts")
    )
    o = tbl(spark, sf, "orders").select(
        F.col("o_custkey"), F.col("o_orderkey"), F.col("o_orderdate")
    )
    # the ts bound lives in the JOIN condition (not a post-filter) so
    # events with no prior order still survive with NULLs
    j = e.join(
        o, (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ev_ts), "left"
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
    )


def q_join_interval(spark, sf):
    """Interval join (op 24): lineitems shipped within [orderdate,
    orderdate+60d) of their order — equi leg on the key keeps the join
    hash-partitioned, the range predicates filter post-join."""
    o = tbl(spark, sf, "orders")
    li = tbl(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_60d"))
    )


ORACLE = {
    "join_cross": """
        SELECT n_nationkey, r_regionkey, n_regionkey = r_regionkey AS home_region
        FROM nation CROSS JOIN region
    """,
    "join_dim_supplier": """
        SELECT n_name, count(*) AS n_suppliers,
               round(CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE), 2) AS sum_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_inner": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "join_broadcast": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_large": """
        SELECT o_orderpriority, count(*) AS n_lines,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "join_outer": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 50000)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "join_range": """
        SELECT band, count(*) AS n_parts
        FROM part
        JOIN (VALUES ('low', 0.0, 500.0), ('mid', 500.0, 1500.0),
                     ('high', 1500.0, 100000.0)) b(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
    """,
    "join_asof": """
        WITH j AS (
            SELECT event_id, user_id, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY event_id
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM events e
            LEFT JOIN orders o ON e.user_id = o.o_custkey
                               AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, o_orderkey, o_orderdate FROM j WHERE rn = 1
    """,
    "join_interval": """
        SELECT o_orderkey, count(*) AS n_shipped_60d
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    AND l_shipdate >= o_orderdate
                    AND l_shipdate < o_orderdate + INTERVAL 60 DAY
        GROUP BY o_orderkey
    """,
}

QUERIES = {
    "join_inner": q_join_inner,
    "join_broadcast": q_join_broadcast,
    "join_large": q_join_large,
    "join_outer": q_join_outer,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_range": q_join_range,
    "join_cross": q_join_cross,
    "join_dim_supplier": q_join_dim_supplier,
    "join_asof": q_join_asof,
    "join_interval": q_join_interval,
}
