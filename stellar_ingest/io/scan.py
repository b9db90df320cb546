"""Typed batch scans (SURVEY.md §2 ops 1-2).

Capability lineage: upstream stellar-ingest reads delimited files with
an externally supplied schema — inference is never trusted for
governed ingestion [PK-high, SURVEY.md §1.1].  Same policy here:
``schema`` is explicit for anything feeding the engine; inference is
allowed only for ad-hoc exploration (``infer=True``).

Pushdown notes: passing an explicit schema + selecting columns early
keeps the parquet scan minimal — Catalyst pushes filters into
``PushedFilters`` and prunes ``ReadSchema`` (verify via
``df.explain("formatted")``); missing columns in older files read back
as NULL (the additive-evolution contract lake/read.py relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_parquet(
    spark: SparkSession,
    path: str | list[str],
    *,
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
    predicate=None,
) -> DataFrame:
    paths = [path] if isinstance(path, str) else list(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*paths)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def scan_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    sep: str = ",",
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("governed CSV scans require an explicit schema (pass infer=True for ad-hoc)")
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def scan_json(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("governed JSON scans require an explicit schema (pass infer=True for ad-hoc)")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
