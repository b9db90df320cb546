"""Aggregation operators + oracle-paired queries (SURVEY.md §2.4
ops 26-34).

Numeric-parity rules for the DuckDB oracle: money math is cast to
DECIMAL *before* summing (exact in both engines), then the final value
is CAST to a shared type — decimal results keep an explicit
precision/scale, averages are computed as double/double division of
exact parts.  Floating aggregation order never decides a digit.

Scale notes: every groupBy here compiles to a partial (map-side)
HashAggregate + final HashAggregate after a shuffle on the group key —
the canonical scalable shape.  `countDistinct` expands; for the
cardinality-at-scale path use `approx_count_distinct` (HLL) — exercised
in tests (not oracle-able bit-for-bit, per SURVEY §2 row 29).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import tbl

DEC = "decimal(18,2)"


def q_agg_basic(spark, sf):
    """TPC-H Q1 shape — the headline pricing summary."""
    li = tbl(spark, sf, "lineitem")
    disc = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast("decimal(8,4)"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc).cast("decimal(38,6)").cast("double").alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
            F.min(F.col("l_quantity").cast(DEC)).cast("double").alias("min_qty"),
            F.max(F.col("l_quantity").cast(DEC)).cast("double").alias("max_qty"),
        )
    )


def q_agg_count_distinct(spark, sf):
    li = tbl(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


def q_agg_rollup(spark, sf):
    li = tbl(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("decimal(38,2)").cast("double").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "sum_qty",
        )
    )


def q_agg_pivot(spark, sf):
    li = tbl(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("decimal(38,2)").cast("double"))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


def q_agg_filtered(spark, sf):
    o = tbl(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice").cast(DEC)))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("filled_total"),
        F.count(F.when(F.col("o_orderstatus") == "O", F.lit(1))).alias("n_open"),
    )


def q_agg_percentiles(spark, sf):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`): median + p90 of line quantities per return flag.
    Exact percentile sorts within groups — fine for bounded group
    counts; the sketch path for 100 TB is op 29's approx family."""
    li = tbl(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("price_p25"),
    )


def q_agg_collect_ordered(spark, sf):
    """Ordered collect (transcript-reassembly shape, op 33) expressed on
    lineitem: per order, line numbers concatenated in order."""
    li = tbl(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("l_linenumber", "l_partkey"))
                    ),
                    lambda s: s["l_partkey"].cast("string"),
                ),
            ).alias("parts_in_line_order")
        )
    )


def q_agg_fingerprint(spark, sf):
    """Order-insensitive table fingerprint (op 34) with a DuckDB-parity
    hash: first 10 hex chars (40 bits) of md5(canonical row), summed as
    BIGINT — 40-bit values keep the sum int64-exact up to ~10^7 rows,
    and BIGINT survives both engines' pandas bridges losslessly."""
    n = tbl(spark, sf, "nation")
    canon = F.concat_ws(
        "\x1f",
        F.col("n_nationkey").cast("string"),
        F.col("n_name"),
        F.col("n_regionkey").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 10), 16, 10).cast("long")
    return n.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(h).alias("fingerprint_sum"),
    )


ORACLE = {
    "agg_basic": """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
               COUNT(*) AS count_order,
               CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
               CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_count_distinct": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_rollup": """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_pivot": """
        SELECT l_returnflag,
               CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS qty_open,
               CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS p50,
               round(quantile_cont(l_quantity, 0.9), 6) AS p90,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_filtered": """
        SELECT o_orderpriority,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DECIMAL(38,2)) AS DOUBLE) AS filled_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_collect_ordered": """
        SELECT l_orderkey,
               string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS parts_in_line_order
        FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey
    """,
    "agg_fingerprint": """
        SELECT COUNT(*) AS rows,
               CAST(SUM(('0x' || substr(md5(concat_ws(chr(31), n_nationkey, n_name, n_regionkey)), 1, 10))::BIGINT) AS BIGINT) AS fingerprint_sum
        FROM nation
    """,
}

QUERIES = {
    "agg_basic": q_agg_basic,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_rollup": q_agg_rollup,
    "agg_pivot": q_agg_pivot,
    "agg_filtered": q_agg_filtered,
    "agg_percentiles": q_agg_percentiles,
    "agg_collect_ordered": q_agg_collect_ordered,
    "agg_fingerprint": q_agg_fingerprint,
}
