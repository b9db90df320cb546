"""Multimodal-column plumbing for training-data pipelines.

Image/audio/video payloads are opaque ``binary`` columns + a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages (the only sanctioned Python
path — per-row UDFs are banned by BASELINE.json:15).

The actual codec step is STUBBED: no image/audio libraries exist in
this container, so ``decode_stub`` produces a deterministic fake
feature vector from the bytes (documented NotImplementedError for real
codecs behind ``STELLAR_REAL_CODECS``).  Everything Spark-side —
schema, batch iteration, partitioning, output contract — is real and
pytest-verified (SURVEY.md-adjacent ⊘ operator; driver records a
rows-only check via the ``multimodal_features`` query).

Scale notes: mapInPandas streams Arrow batches, so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x row width
— at 100 TB the stage is embarrassingly parallel with zero shuffle; put
it AFTER filters/dedup so codecs run on the minimal row set.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .relational import tbl

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 8


def synthesize_media(spark, sf_dir: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for an encoded payload (no external data)."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real codec: FEATURE_DIM floats from
    sha256(payload).  Real decode would go here."""
    if os.environ.get("STELLAR_REAL_CODECS"):
        raise NotImplementedError(
            "real image/audio codecs are not available in this container; "
            "plug Pillow/torchaudio here and keep the same batch contract"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: binary in → fixed-dim float
    vector out, one mapInPandas stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_multimodal_features(spark, sf):
    """Rows-only driver check (no SQL oracle — codec stage is Python by
    nature): stable schema + deterministic features."""
    return extract_features(synthesize_media(spark, sf)).select(
        "media_id", "kind", "n_bytes", F.round(F.element_at("feature", 1), 6).alias("f0")
    )


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLE: dict[str, str] = {}
