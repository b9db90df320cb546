"""Deduplication operators for training-data pipelines over
``documents`` / ``embeddings``: exact (hash-groupBy), MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

All UDF-free column algebra: shingling is `transform(sequence(...))`,
hashing is md5-hex64 (chosen because DuckDB can reproduce it bit-for-bit
— see ops/aggregates.py fingerprint), signatures are groupBy mins.

Scale notes (100 TB corpus):
- exact dedup = one shuffle on the 128-bit content fingerprint;
- MinHash: rows explode x n_hashes — the band-bucket join keys
  (band_id, signature) are high-cardinality and uniform, so the
  candidate-pair join shuffles evenly; banding keeps the pair count
  near-linear instead of quadratic;
- SimHash emits one 64-bit signature per doc (constant state per doc);
  near-dup candidates come from banding the signature's nibbles;
- cosine near-dup: brute-force pairing is quadratic — bounded here by
  doc-id band prefilter; the scale path is ops/similarity.py's LSH;
- exact n-gram Jaccard: prefix-filtered candidate generation
  (AllPairs/PPJoin family) — only each doc's rarest
  ``n - ceil(t*n) + 1`` shingles join, so common shingles never drive a
  quadratic self-join; proven output-identical to the naive form
  (tests/test_training_ops.py) with the naive form kept for small
  bounded corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import tbl, widen
from .text import fingerprint_expr

N_MINHASH = 12
LSH_BANDS = 4  # 12 hashes / 4 bands = 3 rows per band
SHINGLE_K = 3  # word-level 3-shingles


def hex64(col):
    """First 60 bits of md5 as a non-negative long — DuckDB-reproducible
    (('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(col, k: int = SHINGLE_K):
    """Distinct word-level k-shingles as an array<string> (column-only:
    split → sequence → transform → slice/join)."""
    toks = F.split(F.trim(col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", toks))))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup groups: normalized-content fingerprint → canonical
    doc (min doc_id) + duplicate count."""
    return (
        docs.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, h, minhash) — min over shingles of hex64(h || shingle)."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    hashed = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h"),
        "shingle",
    ).select(
        "doc_id",
        "h",
        hex64(F.concat_ws("\x1f", F.col("h").cast("string"), F.col("shingle"))).alias(
            "hv"
        ),
    )
    return hashed.groupBy("doc_id", "h").agg(F.min("hv").alias("minhash"))


def band_signatures(docs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """(doc_id, band, band_sig) — the LSH band keys.  These are the
    rows a corpus-level dedup INDEX persists (ops/dedup_index.py):
    banding is what turns pair generation into an equi-join, and the
    band keys are immutable per doc, so they append once per ingested
    batch and never rewrite."""
    sig = minhash_signatures(docs)
    rows_per_band = N_MINHASH // bands
    return (
        sig.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("h"), F.col("minhash")))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )


def minhash_lsh_pairs(docs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Candidate near-dup pairs: docs sharing a full band signature."""
    banded = band_signatures(docs, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash_expr(col, bits: int = 16):
    """SimHash over word tokens: per bit, sign of sum(+1/-1), packed
    into a long.  Pure column algebra (explode-free: aggregate over the
    token array)."""
    toks = F.array_distinct(F.split(F.trim(col), r"\s+"))
    th = F.transform(toks, lambda t: hex64(t))

    def bit_sum(b: int):
        votes = F.transform(
            th,
            lambda h: F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.aggregate(votes, F.lit(0), lambda acc, x: acc + x)

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def ngram_jaccard_naive(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact n-gram Jaccard, direct form: explode → self-join on shingle
    → |∩| per pair → |∪| from per-doc sizes.  Quadratic on shared
    shingles — right for SMALL bounded corpora (fewer shuffles beats
    prefix bookkeeping below ~10⁴ docs); ngram_jaccard_pairs is the
    scale path and returns identical output."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact n-gram Jaccard with PREFIX FILTERING (AllPairs/PPJoin
    family, public literature): a pair with J ≥ t must share a shingle
    within each side's first ``n - ceil(t·n) + 1`` shingles under a
    global order (rarest-first maximizes pruning) — so candidate
    generation joins only the prefixes, then the full intersection is
    computed for surviving candidates only.  Output is IDENTICAL to the
    naive all-shingles self-join (theorem, and the DuckDB oracle below
    verifies it value-exactly); the candidate join is what scales —
    pruning power grows with t (t=0.9 joins ~10% of shingles).

    Shuffles: freq count (shingle), per-doc rank (doc_id), prefix
    self-join (shingle — rare keys by construction), intersection join
    (candidate pair keys).  No quadratic blowup on common shingles:
    frequent shingles rank LAST and fall outside prefixes."""
    from pyspark.sql import Window

    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        # integer-exact ceil(t*n): float ceil over-rounds exact products
        # (0.28*25 -> 7.000000000000001 -> 8), shortening the prefix by 1
        # and breaking the identical-output theorem.  t is held as a
        # rational tnum/10^6; ceil(a/b) = floor((a+b-1)/b) in integers.
        F.col("rk")
        <= F.col("n_sh")
        - F.floor(
            (F.lit(round(threshold * 1_000_000)) * F.col("n_sh") + F.lit(999_999))
            / F.lit(1_000_000)
        )
        + 1
    ).select("doc_id", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    fb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(fa, "doc_a")
        .join(fb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame, nodes: DataFrame, *, max_iter: int = 25
) -> DataFrame:
    """Near-dup CLUSTERS from candidate pairs: connected components by
    iterative min-label propagation — each superstep sets
    ``label[x] = min(label[x], min over neighbors' labels)`` via one
    join + one groupBy, with a driver-side convergence check counting
    CHANGED labels (a sum of labels would be monotone too, but a sum of
    64-bit ids can wrap at 10^10 docs; a changed-count cannot).

    Scale: supersteps = graph diameter.  Near-dup clusters are small and
    dense (diameter 2-4 even for 10^10 docs — duplicates of one page all
    share bands), so the simple propagation IS the scale plan; each
    superstep shuffles on doc_id only and state is one row per doc.
    Every superstep's result is ``localCheckpoint``-ed — iterative
    self-referencing plans otherwise DOUBLE in depth per round and OOM
    the driver on plan bookkeeping long before data is a problem (use
    reliable ``checkpoint()`` on clusters where executor loss matters).
    The alternating-star contraction (Kiveris et al., public
    literature) drops the round count to O(log n) for pathological
    graphs — not needed for the dedup workload's bounded diameter.

    Returns (doc_id, cluster_id = min doc_id reachable); singleton docs
    keep their own id."""
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    und = und.localCheckpoint()  # the edge set is reused every round
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    for _ in range(max_iter):
        nb = (
            und.alias("e")
            .join(labels.alias("l"), F.col("e.src") == F.col("l.doc_id"))
            .select(
                F.col("e.dst").alias("doc_id"),
                F.col("l.cluster_id").alias("cluster_id"),
            )
        )
        # carry the previous label through the same aggregation (rows
        # from `labels` are the "own" side) so convergence is a cheap
        # changed-count on the just-materialized checkpoint — no extra
        # join, no overflow
        merged = (
            labels.withColumn("__own", F.lit(True))
            .unionByName(nb.withColumn("__own", F.lit(False)))
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.min(F.when(F.col("__own"), F.col("cluster_id"))).alias("__prev"),
            )
            .localCheckpoint()  # truncate lineage: flat plan per round
        )
        n_changed = merged.filter(F.col("cluster_id") != F.col("__prev")).count()
        labels = merged.select("doc_id", "cluster_id")
        if n_changed == 0:
            break
    return labels


# -- oracle-paired queries ---------------------------------------------------


def q_dedup_exact(spark, sf):
    # widen: the per-doc regex+md5 fingerprint pass otherwise runs in
    # one task (documents is a single-row-group file locally)
    return exact_dedup(widen(tbl(spark, sf, "documents")))


def q_dedup_minhash(spark, sf):
    """MinHash signatures (the LSH input) — verified value-exactly;
    the band-join pairs are exercised in pytest (pair emptiness depends
    on corpus duplication, signatures are always checkable)."""
    # widen: shingle explode + 12-way hash fan-out of the 200-doc slice
    # otherwise hashes ~240k shingles in one task
    return minhash_signatures(
        widen(tbl(spark, sf, "documents").filter(F.col("doc_id") < 200))
    )


def q_dedup_simhash(spark, sf):
    # widen: 16 interpreted bit-sum folds per doc, single-task otherwise
    d = widen(tbl(spark, sf, "documents"))
    return d.select("doc_id", simhash_expr(F.col("text")).alias("simhash16"))


def q_dedup_ngram_jaccard(spark, sf):
    # naive form for the bounded driver corpus (fast); the prefix-filter
    # scale path is output-identical (tests/test_training_ops.py)
    return ngram_jaccard_naive(
        tbl(spark, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.3
    )


def q_dedup_clusters(spark, sf):
    """Near-dup cluster assignment (MinHash-LSH pairs → connected
    components) for a bounded doc slice — the full pipeline a
    training-data dedup pass runs: shingle → sign → band → pair →
    cluster → pick canonical per cluster.  Oracle = the same pairs in
    SQL + a recursive-CTE transitive closure, so the iterative Spark
    algorithm is checked value-exactly end-to-end."""
    docs = tbl(spark, sf, "documents").filter(F.col("doc_id") < 300)
    pairs = minhash_lsh_pairs(docs)
    return connected_components(pairs, docs.select("doc_id"))


_SHINGLES_SQL = """
        SELECT doc_id, unnest(list_distinct(CASE
            WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 3 THEN
                list_transform(
                    range(1, len(regexp_split_to_array(trim(text), '\\s+')) - 1),
                    i -> array_to_string(regexp_split_to_array(trim(text), '\\s+')[i:i+2], ' '))
            ELSE [array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' ')]
        END)) AS shingle
        FROM documents
"""

def _simhash_oracle_sql(bits: int = 16) -> str:
    """Generate the DuckDB mirror of simhash_expr (bit loop unrolled)."""
    terms = []
    for b in range(bits):
        ones = f"len(list_filter(th, x -> (x >> {b}) & 1 = 1))"
        terms.append(f"CASE WHEN 2 * {ones} - len(th) > 0 THEN {2**b} ELSE 0 END")
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform(
                       list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                       t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th
            FROM documents
        )
        SELECT doc_id, CAST({' + '.join(terms)} AS BIGINT) AS simhash16 FROM t
    """


ORACLE = {
    "dedup_exact": r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS canonical_doc_id,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "dedup_minhash": f"""
        WITH sh AS ({_SHINGLES_SQL.replace("FROM documents", "FROM documents WHERE doc_id < 200")}),
        hashed AS (
            SELECT doc_id, h, ('0x' || substr(md5(concat_ws(chr(31), h, shingle)), 1, 15))::BIGINT AS hv
            FROM sh, range(0, {N_MINHASH}) t(h)
        )
        SELECT doc_id, CAST(h AS INT) AS h, min(hv) AS minhash
        FROM hashed GROUP BY doc_id, h
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLES_SQL.replace("FROM documents", "FROM documents WHERE doc_id < 300")}),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.3
    """,
    "dedup_simhash": _simhash_oracle_sql(),
    "dedup_clusters": f"""
        WITH RECURSIVE
        sh AS ({_SHINGLES_SQL.replace("FROM documents", "FROM documents WHERE doc_id < 300")}),
        hashed AS (
            SELECT doc_id, h, ('0x' || substr(md5(concat_ws(chr(31), h, shingle)), 1, 15))::BIGINT AS hv
            FROM sh, range(0, {N_MINHASH}) t(h)
        ),
        sig AS (SELECT doc_id, h, min(hv) AS minhash FROM hashed GROUP BY doc_id, h),
        banded AS (
            SELECT doc_id, CAST(h // {N_MINHASH // LSH_BANDS} AS INT) AS band,
                   string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY h) AS band_sig
            FROM sig GROUP BY doc_id, band
        ),
        pairs AS (
            SELECT a.doc_id AS src, b.doc_id AS dst
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
        reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents WHERE doc_id < 300
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    """,
}

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
}
