"""Training-data pipeline operators that aren't SQL-oracle-able:
MinHash-LSH pair recall, LSH-ANN recall vs brute force, multimodal
Arrow plumbing (⊘ rows in SURVEY.md §2 terms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stellar_ingest.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from stellar_ingest.ops.multimodal import (
    FEATURE_DIM,
    extract_features,
    synthesize_media,
)
from stellar_ingest.ops.similarity import (
    brute_force_topk,
    lsh_bucketed_candidates,
)

SF = "/root/testdata/sf0.001"


def _docs_with_dups(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 150)
    # plant near-duplicates: copies with a one-word prefix change
    dups = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("dup "), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(dups)


def test_minhash_lsh_finds_planted_dups(spark):
    docs = _docs_with_dups(spark)
    pairs = minhash_lsh_pairs(docs).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    planted = {(i, i + 10000) for i in range(10)}
    # banding is probabilistic but near-identical docs share ≥1 band
    hits = planted & found
    assert len(hits) >= 7, f"LSH recall too low: {sorted(hits)}"


def test_ngram_jaccard_scores_planted_dups_high(spark):
    docs = _docs_with_dups(spark)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    jmap = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    hits = [(a, b) for (a, b) in jmap if b - a == 10000]
    assert len(hits) >= 8


def test_lsh_ann_finds_planted_neighbors(spark):
    """Multi-table sign-LSH: plant true near-duplicates (cos≈1) in a
    near-orthogonal corpus; LSH must recover them while passing only a
    small fraction of the quadratic pair space (the scale rationale)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01 + 0.002).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(planted)
    cands = lsh_bucketed_candidates(corpus, tables=8, bits=8).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in cands}
    want = {(i, i + 10000) for i in range(15)}
    hits = want & found
    n = corpus.count()
    quad = n * (n - 1) / 2
    assert len(cands) < 0.10 * quad, f"bucketing too loose: {len(cands)}/{quad}"
    assert len(hits) >= 13, f"planted-neighbor recall {len(hits)}/15"
    # and LSH-scored cosines agree with the brute-force top-1 for the
    # planted queries (cos ≈ 1 dominates everything else)
    exact = brute_force_topk(corpus, corpus.filter(F.col("vec_id") >= 10000), k=1)
    top1 = {r["query_id"]: r["cand_id"] for r in exact.collect()}
    assert all(top1[10000 + i] == i for i in range(15))


def test_multimodal_batch_plumbing(spark):
    media = synthesize_media(spark, SF)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    r0 = rows[0]
    assert len(r0["feature"]) == FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in r0["feature"])
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again[r0["media_id"]] == r0["feature"]
    # metadata struct round-trips
    m = media.select("meta.width", "meta.height").first()
    assert m["width"] >= 16 and m["height"] >= 16


def test_prefix_filtered_jaccard_equals_naive(spark):
    """The PPJoin-style prefix-filtered exact Jaccard must return
    EXACTLY the naive self-join's pairs (the prefix-filter theorem),
    at multiple thresholds."""
    from stellar_ingest.ops.dedup import ngram_jaccard_naive

    docs = _docs_with_dups(spark)
    # 0.28 hits the float-ceil trap (0.28*25 -> 7.000000000000001)
    for t in (0.28, 0.3, 0.6, 0.9):
        naive = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_naive(docs, threshold=t).collect()
        }
        pref = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert pref == naive, f"threshold {t}: prefix != naive"
        if t == 0.6:
            assert naive, "expected planted near-dups above 0.6"


def test_connected_components_transitive_chain(spark):
    """a~b and b~c share LSH bands but a and c need not: the cluster
    must still be {a,b,c} (transitivity), with unrelated docs singleton
    and min-id canonical labels."""
    from pyspark.sql import functions as F

    from stellar_ingest.ops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8), (8, 7)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7, 8, 9]], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7, 9: 7}

    # long chain (diameter > a couple supersteps) still converges
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20, 30)], "doc_a long, doc_b long"
    )
    cnodes = spark.createDataFrame([(i,) for i in range(20, 31)], "doc_id long")
    got2 = connected_components(chain, cnodes).collect()
    assert {r["cluster_id"] for r in got2} == {20}


def test_ivf_topk_recall_vs_brute_force(spark):
    """The IVF probe search must (a) be deterministic, (b) score every
    returned pair exactly (its cos values are exact for the pairs it
    returns), and (c) reach high top-5 recall vs the exact scan at
    nprobe=3 of 8 cells on the fixture embeddings."""
    from pyspark.sql import functions as F

    from stellar_ingest.ops.relational import tbl
    from stellar_ingest.ops.similarity import brute_force_topk, ivf_topk

    sf = "/root/testdata/sf0.001"
    emb = tbl(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    qs = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["cand_id"]) for r in brute_force_topk(emb, qs, k=5).collect()
    }
    got1 = ivf_topk(emb, qs, n_cells=8, nprobe=3, k=5).collect()
    got2 = ivf_topk(emb, qs, n_cells=8, nprobe=3, k=5).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))  # deterministic
    approx = {(r["query_id"], r["cand_id"]) for r in got1}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall  # honest bound: see docstring note below
    # exactness of returned scores: every returned pair's cos matches
    # the brute-force score for that pair
    bf = {
        (r["query_id"], r["cand_id"]): r["cos"]
        for r in brute_force_topk(emb, qs, k=200).collect()
    }
    for r in got1:
        assert bf[(r["query_id"], r["cand_id"])] == r["cos"]
    # full probe (= all cells) recovers the exact answer entirely
    full = ivf_topk(emb, qs, n_cells=8, nprobe=8, k=5)
    assert {(r["query_id"], r["cand_id"]) for r in full.collect()} == exact
