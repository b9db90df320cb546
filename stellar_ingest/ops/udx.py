"""Pandas-UDF / UDTF escape hatches (SURVEY.md §2.10 ops 61/63/64).

The engine's hot path is deliberately UDF-free (BASELINE.json
input_hint: vectorized DataFrame ops, no per-row Python) — these are
the sanctioned Arrow-batched escape hatches a user reaches for when no
builtin exists, each implemented as a small, tested, oracle-paired
exemplar OFF the CDC path:

- op 61 scalar pandas UDF: vectorized L2 norm over ``array<float>``
  embeddings (numpy over Arrow batches; one ``np.stack`` per batch,
  zero per-row Python in the loop body).
- op 63 pandas UDAF: ``median`` as a Series→scalar grouped aggregate
  (Arrow transfers each group's column once).
- op 64 UDTF: lateral expansion of a text column into indexed tokens
  (``explode``-style generator as a table function).

Scale: scalar UDFs stream Arrow batches (no shuffle); the UDAF
shuffles on its group key like any agg; the UDTF is a per-row
generator (narrow, no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from .relational import tbl


@pandas_udf(T.DoubleType())
def l2_norm(emb: pd.Series) -> pd.Series:
    """Vectorized: one float64 matrix per Arrow batch (fixed dim)."""
    m = np.stack(emb.to_numpy()).astype(np.float64)
    return pd.Series(np.sqrt((m * m).sum(axis=1)))


@pandas_udf(T.DoubleType())
def median_agg(v: pd.Series) -> float:
    """Series→scalar pandas UDAF (op 63)."""
    return float(np.median(v.to_numpy(dtype=np.float64)))


_UDTF_SCHEMA = T.StructType(
    [
        T.StructField("tok_idx", T.IntegerType()),
        T.StructField("tok", T.StringType()),
    ]
)


@udtf(returnType=_UDTF_SCHEMA)
class TokenExpand:
    """UDTF (op 64): one (index, token) row per whitespace token."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield i, tok


def q_udf_scalar(spark, sf):
    e = tbl(spark, sf, "embeddings")
    return e.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2"))


def q_udaf_grouped(spark, sf):
    e = tbl(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(median_agg("value"), 6).alias("median_value")
    )


def q_udtf_expand(spark, sf):
    d = tbl(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return d.lateralJoin(TokenExpand(F.col("text").outer())).select(
        "doc_id", "tok_idx", "tok"
    )


ORACLE = {
    "udf_scalar": """
        SELECT vec_id,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
        FROM embeddings
    """,
    "udaf_grouped": """
        SELECT event_type, round(median(value), 6) AS median_value
        FROM events GROUP BY event_type
    """,
    "udtf_expand": """
        WITH d AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) - 1 AS INT) AS tok_idx,
               unnest(toks) AS tok
        FROM d
    """,
}

QUERIES = {
    "udf_scalar": q_udf_scalar,
    "udaf_grouped": q_udaf_grouped,
    "udtf_expand": q_udtf_expand,
}
