"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship slice: deterministic mini-ledger → full CDC
ingest (LSN dedupe → LWW → MERGE upserts into the icebox snapshot table,
epoch-fenced exactly-once, mid-stream schema evolution) → reassembled
multi-turn transcripts (SURVEY.md §3.3).

``queries()`` / ``oracle_sql()`` — operator surface per SURVEY.md §2;
keys without an oracle entry are non-SQL-expressible (CDC composites,
HLL sketches, LSH bucket joins, multimodal codec stages) and are
pytest-verified instead (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stellar_ingest import registry  # noqa: E402
from stellar_ingest.flagship import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline operators).  Each callable takes
    (spark, sf_dir) and returns a DataFrame with oracle-matched
    column names."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-able key (views: region
    nation customer supplier part orders lineitem events documents
    embeddings)."""
    return registry.oracle_sql()
