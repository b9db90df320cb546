"""Scalar-function families, one oracle-paired query each
(SURVEY.md §2.8 ops 47-54).

Cross-engine parity notes baked into these queries:
- transcendentals (ln/pow/sqrt) differ by ulps between JVM and DuckDB →
  results are rounded to 6 dp;
- DuckDB ``regexp_replace`` replaces the FIRST match unless the 'g'
  flag is passed; Spark always replaces all → oracle passes 'g';
- DuckDB ``date_trunc('month', ts)`` yields DATE, Spark yields
  TIMESTAMP → oracle casts;
- array results are rendered to strings (``array_join``) so value
  hashing never depends on engine-specific list encodings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import tbl


def q_fn_string(spark, sf):
    c = tbl(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.col("c_name").like("%er%").alias("has_er"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
    )


def q_fn_datetime(spark, sf):
    o = tbl(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hr"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("plus_90d"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_us"),
    )


def q_fn_math(spark, sf):
    p = tbl(spark, sf, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price, 1).alias("price_r1"),
        F.abs(price - 1000.0).alias("dist_1000"),
        F.floor(price).cast("long").alias("price_floor"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.pow(F.col("p_size").cast("double"), 2.0), 6).alias("size_sq"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("key_mod7"),
        price.cast("decimal(12,2)").cast("double").alias("price_dec"),
    )


def q_fn_conditional(spark, sf):
    o = tbl(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floor_50k"),
        F.least(F.col("o_totalprice"), F.lit(50000.0)).alias("cap_50k"),
        F.nvl2(F.nullif("o_orderstatus", F.lit("F")), F.lit(1), F.lit(0)).alias(
            "not_filled_flag"
        ),
    )


def q_fn_array(spark, sf):
    """Array construction + higher-order functions; embedding dot
    product via zip_with/aggregate fold (the SURVEY §2 row 51 idiom)."""
    e = tbl(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.zip_with(emb_d, emb_d, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    first8 = F.slice(F.col("embedding"), 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(dot_self, 6).alias("norm_sq"),
        F.round(
            F.aggregate(first8, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("sum_first8"),
        F.array_join(
            F.transform(
                F.sort_array(F.sequence(F.lit(1), F.pmod("vec_id", F.lit(5)) + 1), False),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("seq_desc"),
        F.array_contains(F.sequence(F.lit(0), F.lit(10), F.lit(2)), F.col("label")).alias(
            "label_is_small_even"
        ),
    )


def q_fn_map(spark, sf):
    """Map/struct surface rendered to scalar columns."""
    n = tbl(spark, sf, "nation")
    m = F.create_map(F.lit("nation"), F.col("n_name"), F.lit("key"), F.col("n_nationkey").cast("string"))
    st = F.struct(F.col("n_nationkey").alias("k"), F.col("n_name").alias("nm"))
    return n.select(
        "n_nationkey",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("mkeys"),
        m["nation"].alias("mval"),
        st["nm"].alias("struct_name"),
    )


def q_fn_json(spark, sf):
    e = tbl(spark, sf, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
        F.to_json(F.struct(F.col("event_type").alias("t"))).alias("wrapped"),
    )


def q_fn_variant(spark, sf):
    """Variant family (op 53, the VariantType path claimed in SURVEY
    §1.3): parse_json → VARIANT, typed extraction with try_variant_get,
    canonical re-serialization with to_json.  Variant keeps the parsed
    tree in a binary encoding — at 100 TB this beats re-parsing JSON
    text per access and pushes shredded-field pruning to the scan."""
    e = tbl(spark, sf, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
        F.to_json(v).alias("vjson"),
    )


def q_fn_hash(spark, sf):
    r = tbl(spark, sf, "region")
    return r.select(
        "r_regionkey",
        F.md5(F.col("r_name")).alias("md5_hex"),
        F.sha2(F.col("r_name"), 256).alias("sha256_hex"),
        F.conv(F.substring(F.md5("r_name"), 1, 15), 16, 10).cast("long").alias("hash64"),
    )


ORACLE = {
    "fn_string": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               length(c_name) AS name_len,
               substring(c_name, 1, 8) AS name_prefix,
               concat_ws('|', c_mktsegment, c_name) AS seg_name,
               c_name LIKE '%er%' AS has_er,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               regexp_replace(c_name, '[aeiou]', '_', 'g') AS devoweled,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               trim(lower(c_mktsegment)) AS seg_lower,
               levenshtein(c_mktsegment, 'BUILDING') AS lev_building
        FROM customer
    """,
    "fn_datetime": """
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(hour(o_orderdate) AS INT) AS hr,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy,
               o_orderdate + INTERVAL 90 DAY AS plus_90d,
               epoch_us(o_orderdate) AS epoch_us
        FROM orders
    """,
    "fn_math": """
        SELECT p_partkey,
               round(p_retailprice, 1) AS price_r1,
               abs(p_retailprice - 1000.0) AS dist_1000,
               CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
               CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
               round(ln(p_retailprice), 6) AS ln_price,
               round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
               p_partkey % 7 AS key_mod7,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
        FROM part
    """,
    "fn_conditional": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 100000 THEN 'big'
                    WHEN o_totalprice > 10000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
               greatest(o_totalprice, 50000.0) AS floor_50k,
               least(o_totalprice, 50000.0) AS cap_50k,
               CASE WHEN nullif(o_orderstatus, 'F') IS NOT NULL THEN 1 ELSE 0 END AS not_filled_flag
        FROM orders
    """,
    "fn_array": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS norm_sq,
               round(list_aggregate((embedding[1:8])::DOUBLE[], 'sum'), 6) AS sum_first8,
               array_to_string(list_reverse(list_sort(range(1, (vec_id % 5) + 2))), ',') AS seq_desc,
               list_contains(range(0, 11, 2), label) AS label_is_small_even
        FROM embeddings WHERE vec_id < 100
    """,
    "fn_map": """
        SELECT n_nationkey,
               array_to_string(list_sort(map_keys(MAP(['nation','key'], [n_name, CAST(n_nationkey AS VARCHAR)]))), ',') AS mkeys,
               n_name AS mval,
               n_name AS struct_name
        FROM nation
    """,
    "fn_json": """
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               json_extract_string(props, '$.missing') AS missing,
               '{"t":"' || event_type || '"}' AS wrapped
        FROM events WHERE event_id < 2000
    """,
    "fn_variant": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               json_extract_string(props, '$.k') AS k_str,
               json_extract_string(props, '$.missing') AS missing,
               json_extract(props, '$')::VARCHAR AS vjson
        FROM events WHERE event_id < 2000
    """,
    "fn_hash": """
        SELECT r_regionkey,
               md5(r_name) AS md5_hex,
               sha256(r_name) AS sha256_hex,
               ('0x' || substr(md5(r_name), 1, 15))::BIGINT AS hash64
        FROM region
    """,
}

QUERIES = {
    "fn_string": q_fn_string,
    "fn_datetime": q_fn_datetime,
    "fn_math": q_fn_math,
    "fn_conditional": q_fn_conditional,
    "fn_array": q_fn_array,
    "fn_map": q_fn_map,
    "fn_json": q_fn_json,
    "fn_variant": q_fn_variant,
    "fn_hash": q_fn_hash,
}
