"""Window operators + oracle-paired queries (SURVEY.md §2.5 ops 35-41,
§2.9 op 56).

The ranking window here is the same physical shape as the engine's LWW
resolve (cdc/resolve.py): Exchange on the partition key + in-partition
sort — one shuffle, no driver involvement, scales with partition count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import tbl, widen

DEC = "decimal(18,2)"


def topk_per_group(df, part_cols, order_cols, k: int):
    """Top-k per group (op 41): rank + filter — partial per-partition
    sort, never a global one."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    ).drop("__rn")


def q_win_rank(spark, sf):
    o = tbl(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def q_win_lag_lead(spark, sf):
    e = tbl(spark, sf, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts", 1).over(w).cast("timestamp"))).alias(
            "micros_since_prev"
        ),
    )


def q_win_running(spark, sf):
    li = tbl(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("decimal(38,2)").cast("double").alias("running_qty"),
    )


def q_win_range_frame(spark, sf):
    """30-day trailing spend per customer — a RANGE frame over epoch
    seconds (time-based frames, op 38)."""
    o = tbl(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("decimal(38,2)").cast("double").alias("trailing_30d"),
    )


def q_win_last_nn(spark, sf):
    """Last non-null carried forward (op 39) — the 'last known tool per
    conversation' pattern, here: last seen error event_type per user."""
    e = tbl(spark, sf, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = e.withColumn(
        "err_val", F.when(F.col("event_type") == "error", F.col("value"))
    )
    return marked.select(
        "user_id",
        "event_id",
        F.last("err_val", ignorenulls=True).over(w).alias("last_error_value"),
    )


def q_win_ntile(spark, sf):
    """Scale note: an UNPARTITIONED window is inherent to global
    quantile semantics — Spark executes it as a single task after a
    global sort, so this is a small-result analytical op, not a hot-path
    one.  At 100 TB you'd pre-aggregate (approx_percentile per partition
    → merge) or partition the window by a coarse key; the exact global
    rank here exists for oracle-paired correctness of ntile/percent_rank/
    cume_dist themselves."""
    c = tbl(spark, sf, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_topk_per_group(spark, sf):
    # widen on the WINDOW KEY: the in-partition sort otherwise runs in
    # as few tasks as the input has row groups (2 at sf1.0), and a keyed
    # repartition is REUSED by the window (one exchange total, §2.4)
    return topk_per_group(
        widen(
            tbl(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
            key_cols=["o_custkey"],
        ),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


def q_win_tumbling(spark, sf):
    """Tumbling 6-hour event windows (op 56, batch-expressible).
    Deliberately NOT widened: measured 0.35 s single-task partial agg vs
    0.93 s with a pre-agg repartition — the full-data exchange costs
    more than the map-side agg saves (the agg collapses 1M rows to 600
    groups before any shuffle)."""
    e = tbl(spark, sf, "events")
    win = F.window(F.col("ts"), "6 hours")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("decimal(38,2)").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def q_win_sliding(spark, sf):
    """Sliding (hopping) windows — 6-hour width, 3-hour slide: each
    event lands in exactly two overlapping windows (op 56's hopping
    form).  Oracle mirrors the assignment arithmetically (epoch-aligned
    buckets, one row per candidate window start)."""
    e = tbl(spark, sf, "events")
    win = F.window(F.col("ts"), "6 hours", "3 hours")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("decimal(38,2)").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


ORACLE = {
    "win_rank": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "win_lag_lead": """
        SELECT user_id, event_id,
               lag(event_type, 1) OVER w AS prev_type,
               lead(event_type, 1) OVER w AS next_type,
               epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS micros_since_prev
        FROM events WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "win_running": """
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS running_qty
        FROM lineitem WHERE l_orderkey < 300
    """,
    "win_range_frame": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS trailing_30d
        FROM orders WHERE o_custkey < 100
    """,
    "win_last_nn": """
        SELECT user_id, event_id,
               last_value(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_value
        FROM events WHERE user_id < 10
    """,
    "win_ntile": """
        SELECT c_custkey,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) WHERE rn <= 3
    """,
    "win_tumbling": """
        SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000) AS win_start,
               event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "win_sliding": """
        WITH cand AS (
            SELECT ts, value,
                   unnest([CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT),
                           CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) - 10800]) AS ws
            FROM events
        )
        SELECT make_timestamp(ws * 1000000) AS win_start,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
        FROM cand
        WHERE epoch(ts) >= ws AND epoch(ts) < ws + 21600
        GROUP BY ws
    """,
}

QUERIES = {
    "win_rank": q_win_rank,
    "win_lag_lead": q_win_lag_lead,
    "win_running": q_win_running,
    "win_range_frame": q_win_range_frame,
    "win_last_nn": q_win_last_nn,
    "win_ntile": q_win_ntile,
    "topk_per_group": q_topk_per_group,
    "win_tumbling": q_win_tumbling,
    "win_sliding": q_win_sliding,
}
