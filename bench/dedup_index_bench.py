"""Corpus-incremental dedup: measured break-even vs full rebuild.

The claim under test (ops/dedup_index.py): a batch-internal dedup
pipeline pays Θ(corpus) COMPUTE every epoch (re-shingle + re-minhash
every stored doc), while the index pays Θ(batch + candidates) plus a
fixed per-epoch cost (two icebox commits, superstep scheduling).  At
tiny corpora the fixed cost dominates and a rebuild is cheaper; the
crossover arrives as soon as re-hashing the corpus costs more than the
bookkeeping — and from there the gap grows linearly with corpus size.

Corpus: the fixture ``documents`` table replicated K× with every word
suffixed by the replica id (deterministic, no external data; replicas
share no shingles, so the corpus grows without manufacturing synthetic
mega-clusters).  Batch: 50 genuinely new docs.

Usage: python bench/dedup_index_bench.py         # prints one JSON line
Env: DIX_BENCH_REPLICAS=40 DIX_BENCH_SF_DIR=/root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stellar_ingest.ops.dedup import (  # noqa: E402
    connected_components,
    minhash_lsh_pairs,
)
from stellar_ingest.ops.dedup_index import (  # noqa: E402
    dedup_index_init,
    ingest_batch,
)
from stellar_ingest.session import get_spark  # noqa: E402


def replicated_docs(spark, sf_dir: str, replicas: int):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = base.count()
    reps = spark.range(replicas).select(F.col("id").alias("k"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: F.concat(w, F.lit("_"), F.col("k").cast("string")),
                ),
                " ",
            ).alias("text"),
        )
    ), n


def main() -> int:
    sf_dir = os.environ.get("DIX_BENCH_SF_DIR", "/root/testdata/sf0.01")
    replicas = int(os.environ.get("DIX_BENCH_REPLICAS", "40"))
    spark = get_spark("dix-bench", cores=8, shuffle_partitions=16)
    docs, n_base = replicated_docs(spark, sf_dir, replicas)
    docs = docs.localCheckpoint()  # pin: both paths read identical input
    corpus_n = n_base * replicas
    corpus = docs.filter(F.col("doc_id") < corpus_n - 50)
    batch = docs.filter(F.col("doc_id") >= corpus_n - 50)

    work = tempfile.mkdtemp(prefix="dix_bench_")
    try:
        root = os.path.join(work, "idx")
        dedup_index_init(root)
        t0 = time.monotonic()
        ingest_batch(spark, corpus, root, epoch=1)
        t_seed = time.monotonic() - t0

        t0 = time.monotonic()
        m = ingest_batch(spark, batch, root, epoch=2)
        t_inc = time.monotonic() - t0

        t0 = time.monotonic()
        connected_components(
            minhash_lsh_pairs(docs), docs.select("doc_id")
        ).count()
        t_full = time.monotonic() - t0

        print(json.dumps({
            "corpus_docs": corpus_n - 50,
            "batch_docs": 50,
            "seed_epoch_sec": round(t_seed, 1),
            "incremental_epoch_sec": round(t_inc, 1),
            "full_rebuild_sec": round(t_full, 1),
            "speedup_inc_vs_rebuild": round(t_full / t_inc, 2),
            "cross_edges": m["cross_edges"],
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
