"""Composite analytical pipelines (TPC-H Q3/Q4/Q5/Q10/Q18 shapes) — each one
exercises a multi-operator chain (scan → pushdown filter → multi-way
join → decimal aggregate → ordered top-k) through the same building
blocks the rest of §2 verifies individually.  Complements `agg_basic`,
which is the Q1 pricing-summary shape.

Determinism for the oracle hash: every top-k is fully tie-broken by a
unique key, and all money math follows the repo convention (exact
DECIMAL internally, one correctly-rounded cast to DOUBLE at the end —
see relational.dbl).

Plan notes (verify with .explain("formatted")): region/nation are
explicit broadcasts; customer/orders/lineitem join under AQE (broadcast
below threshold, else shuffle join on the natural keys); date/segment
filters push into the parquet scans (`PushedFilters`), and the final
top-k compiles to TakeOrderedAndProject.  At 100 TB the same plans
hold — dims stay broadcast, fact-fact joins hash-partition on
uniformly distributed keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import tbl

DEC = "decimal(18,2)"


def _revenue():
    return F.col("l_extendedprice").cast(DEC) * (
        1 - F.col("l_discount").cast("decimal(8,4)")
    )


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"


def q_tpch_q3(spark, sf):
    """Shipping-priority shape: 3-way join, grouped revenue, top 10."""
    c = tbl(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = tbl(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark, sf):
    """Local-supplier-volume shape: 6-way join (2 broadcast dims),
    revenue per nation."""
    r = tbl(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = tbl(spark, sf, "nation")
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = tbl(spark, sf, "lineitem")
    s = tbl(spark, sf, "supplier")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q_tpch_q10(spark, sf):
    """Returned-item-reporting shape: customer revenue ranking over a
    quarter, top 20."""
    c = tbl(spark, sf, "customer")
    o = tbl(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = tbl(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tbl(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q_tpch_q4(spark, sf):
    """Order-priority-checking shape (Q4): correlated EXISTS compiled to
    a left-semi join with a non-equi conjunct (late-shipped lines).  The
    fixture lineitem has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 60 days — same plan shape, same
    correlated-EXISTS semantics."""
    o = tbl(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = tbl(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q18(spark, sf):
    """Large-volume-customer shape (Q18): self-aggregated semi filter
    (HAVING SUM > T) joined back to orders+customer, top 20."""
    li = tbl(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    o = tbl(spark, sf, "orders")
    c = tbl(spark, sf, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(20)
    )


def q_tpch_q1(spark, sf):
    """Pricing-summary shape (Q1): full-table grouped decimal sums +
    derived averages over (returnflag, linestatus).  Averages are ONE
    IEEE division of the already-rounded double sums — identical op on
    both engines, so the hash stays exact (decimal÷count scales differ
    between engines, double÷long does not)."""
    li = tbl(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(8,4)")
    tax = F.col("l_tax").cast("decimal(8,4)")

    def dbl(c):
        return c.cast("decimal(38,6)").cast("double")

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(qty)).alias("sum_qty"),
            dbl(F.sum(price)).alias("sum_base_price"),
            dbl(F.sum(price * (1 - disc))).alias("sum_disc_price"),
            dbl(F.sum(price * (1 - disc) * (1 + tax))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q6(spark, sf):
    """Forecast-revenue shape (Q6): the pure scan-bound query — every
    predicate pushes into the parquet scan, the aggregate is one
    map-side partial + one row.  The canary for pushdown health."""
    li = tbl(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(
        "decimal(8,4)"
    )
    return li.agg(
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue")
    )


def q_tpch_q14(spark, sf):
    """Promotion-effect shape (Q14): conditional aggregate over a
    fact⋈dim join — promo revenue share for one ship-month.  part is
    broadcast; the ratio is one double division of rounded sums (same
    rationale as Q1's averages)."""
    li = tbl(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = tbl(spark, sf, "part")
    rev = _revenue()
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC)))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("promo"),
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("total"),
    )
    return agg.select(
        (F.lit(100.0) * (F.col("promo") / F.col("total"))).alias("promo_share")
    )


def q_tpch_q19(spark, sf):
    """Discounted-revenue shape (Q19): disjunctive multi-attribute
    predicate (brand × size × quantity bands) over lineitem⋈part —
    the OR-of-ANDs pushes partially into both scans and the join stays
    a broadcast; exercises boolean predicate simplification."""
    li = tbl(spark, sf, "lineitem")
    p = tbl(spark, sf, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#6")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        F.sum(_revenue()).cast("decimal(38,6)").cast("double").alias("revenue")
    )


ORACLE = {
    "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "tpch_q5": f"""
        SELECT n_name,
               CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-10-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
}

ORACLE["tpch_q4"] = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

ORACLE["tpch_q18"] = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180) big
      ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY sum_qty DESC, o_orderkey
    LIMIT 20
"""

ORACLE["tpch_q1"] = """
    SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
           sum_disc_price, sum_charge, count_order,
           sum_qty / count_order AS avg_qty,
           sum_base_price / count_order AS avg_price
    FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,4))) * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    )
    ORDER BY l_returnflag, l_linestatus
"""

ORACLE["tpch_q6"] = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""

ORACLE["tpch_q14"] = f"""
    SELECT 100.0 * (promo / total) AS promo_share
    FROM (
        SELECT
          CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo,
          CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    )
"""

ORACLE["tpch_q19"] = f"""
    SELECT CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#6' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q10": q_tpch_q10,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
}
