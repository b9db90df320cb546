"""Similarity search over the ``embeddings`` table (array<float>
column): brute-force cosine top-k as the exactness baseline, a
sign-random-projection LSH bucketing as the scale path, and
embedding-cosine near-duplicate pairs.

Dot products are UDF-free: ``aggregate(zip_with(a,b,(x,y)->x*y), 0D,
(s,x)->s+x)`` — a sequential left fold, which both Spark and DuckDB
reproduce deterministically (results rounded to 6 dp before any
threshold so engine ulp noise can't flip a comparison).

Scale notes: brute force is O(Q x N) — fine for small query sets
(broadcast the queries, the corpus never shuffles).  The LSH variant
buckets by a b-bit signature of deterministic hash-derived hyperplanes:
candidates collapse to a same-bucket equi-join (shuffle key = bucket,
uniform by construction), turning quadratic search near-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hex64
from .relational import tbl, widen

LSH_BITS = 8
LSH_DIM_STRIDE = 8  # hyperplane i uses dims [i*stride, (i+1)*stride)

#: fixture embedding width — the unrolled fast path below is GUARDED by
#: a runtime size() check, so data of any other width still computes
#: through the generic fold (identical results, interpreted speed)
EMB_DIM = 64


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _fold_dot_spark_sql(a: str, b: str) -> str:
    """Spark-SQL text of the generic fold — the exact computation dot_expr
    builds (cast-to-double elements, left fold from 0.0)."""
    return (
        f"aggregate(zip_with(transform(`{a}`, x -> CAST(x AS DOUBLE)), "
        f"transform(`{b}`, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _dot_sql(a: str, b: str, dim: int) -> str:
    """Static-width dot product as a flat, whole-stage-codegen-able
    expression, guarded by a size() check (any other width falls back to
    the generic fold).  Bit-identical to ``aggregate(zip_with(...))``:
    the fold is the left-associated sum ((0.0 + a0*b0) + a1*b1) + ...
    and this emits exactly that tree — higher-order functions are
    CodegenFallback (interpreted per element), measured ~3 s for 100k
    64-dim pairs vs ~0.3 s unrolled.  Built as ONE SQL string parsed
    once: composing 64 terms through Column operators costs a py4j
    round-trip per operator (~1.3 s of driver time per query build)."""
    terms = " + ".join(
        f"CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE)" for i in range(dim)
    )
    return (
        f"CASE WHEN size(`{a}`) = {dim} AND size(`{b}`) = {dim} "
        f"THEN 0.0D + {terms} ELSE {_fold_dot_spark_sql(a, b)} END"
    )


def dot_fast(a: str, b: str, dim: int = EMB_DIM):
    """dot over float-array COLUMN NAMES: unrolled codegen path when
    both sides have the expected static width, generic fold otherwise
    (same values — float→double casts and add order are identical)."""
    return F.expr(_dot_sql(a, b, dim))


def norm_fast(a: str, dim: int = EMB_DIM):
    return F.expr(f"SQRT({_dot_sql(a, a, dim)})")


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b):
    return F.round(dot_expr(a, b) / (norm_expr(a) * norm_expr(b)), 6)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, rank, keep k.
    ``queries``/``corpus``: (vec_id, embedding)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_fast("embedding").alias("q_nrm"),
    )
    # norms are computed ONCE per row before the pair join (each corpus
    # row previously re-derived its norm per query); widen() spreads the
    # single-row-group local scan across the cluster — the pair compute,
    # not the 6 MB scan, is the cost
    c = widen(corpus).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm_fast("embedding").alias("c_nrm"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        F.round(
            dot_fast("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def lsh_signature_expr(emb, bits: int = LSH_BITS, stride: int = LSH_DIM_STRIDE):
    """b-bit sign signature: bit i = sign(sum of a deterministic
    hash-weighted slice of the embedding).  Hyperplane weights are
    +1/-1 from hex64(i, j) — reproducible on any engine, no stored
    model."""
    embd = as_double(emb)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        slice_i = F.slice(embd, i * stride + 1, stride)
        proj = F.aggregate(
            F.zip_with(
                slice_i,
                F.sequence(F.lit(i * stride), F.lit((i + 1) * stride - 1)),
                lambda x, j: F.when(
                    F.pmod(hex64(F.concat_ws(",", F.lit("hp"), j.cast("string"))), F.lit(2)) == 1,
                    x,
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _table_sig_expr(emb, table: int, bits: int, dim: int):
    """One LSH table's b-bit signature: each bit is the sign of a
    full-dimension random-hyperplane projection whose ±1 weights derive
    from hex64(table, bit, dim-index) — deterministic, engine-agnostic."""
    embd = as_double(emb)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.zip_with(
                embd,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: F.when(
                    F.pmod(
                        F.xxhash64(F.lit("hp"), F.lit(table), F.lit(b), j), F.lit(2)
                    )
                    == 1,
                    x,
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_bucketed_candidates(
    corpus: DataFrame, *, tables: int = 8, bits: int = 4, dim: int = 64
) -> DataFrame:
    """ANN scale path: MULTI-TABLE sign-LSH.  A single table's collision
    probability for cosine≈0.45 neighbors is (1-θ/π)^bits ≈ 0.18 — too
    low; the union over L tables lifts recall to 1-(1-p)^L ≈ 0.8.
    Candidates collapse to an equi-join on (table, signature) — uniform
    shuffle keys, near-linear instead of quadratic pair generation."""
    sigs = corpus.select(
        "vec_id",
        "embedding",
        F.array(
            *[_table_sig_expr(F.col("embedding"), t, bits, dim) for t in range(tables)]
        ).alias("sigs"),
    )
    exploded = sigs.select(
        "vec_id", "embedding", F.posexplode("sigs").alias("tbl", "sig")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
        .join(corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")), "vec_a")
        .join(corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_expr(as_double(F.col("ea")), as_double(F.col("eb"))).alias("cos"),
        )
    )


def _centroid_list(cent) -> list[tuple[int, list[float]]]:
    """Centroids as a sorted driver-side list [(cell, vector)] — the
    quantizer is n_cells × dim doubles (kilobytes at any corpus size),
    so it travels as expression literals, never as a join side."""
    if isinstance(cent, list):
        return sorted((int(c), [float(x) for x in v]) for c, v in cent)
    return sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]]) for r in cent.collect()
    )


def _cell_scores_expr(cents: list[tuple[int, list[float]]], emb_col: str):
    """array<struct<negcos, cell>> of every cell's (negated, 6-dp
    rounded) cosine to the row's embedding — centroids and their norms
    are driver-computed literals, so scoring is a pure projection.
    Per-cell dots are unrolled against the literal centroid (the width
    is known from the centroid itself), guarded by a size() check so a
    width-mismatched row falls back to the generic fold — identical
    values either way, codegen speed on the fast path.  Emitted as ONE
    SQL string (see _dot_sql: Column-operator composition costs a py4j
    round-trip per term)."""
    import math

    e = emb_col
    structs = []
    norm_sql = None
    for cell, vec in cents:
        dim = len(vec)
        if norm_sql is None:
            # row norm shared across cells (fast-path width = first
            # centroid's; Lloyd keeps all centroids the same width);
            # codegen CSE collapses the repeats across cells
            self_terms = " + ".join(
                f"CAST(`{e}`[{i}] AS DOUBLE) * CAST(`{e}`[{i}] AS DOUBLE)"
                for i in range(dim)
            )
            norm_sql = (
                f"CASE WHEN size(`{e}`) = {dim} THEN SQRT(0.0D + {self_terms}) "
                f"ELSE SQRT({_fold_dot_spark_sql(e, e)}) END"
            )
        cnorm = math.sqrt(sum(x * x for x in vec)) or 1.0
        terms = " + ".join(
            f"CAST(`{e}`[{i}] AS DOUBLE) * {float(w)!r}D" for i, w in enumerate(vec)
        )
        lit_arr = "array(" + ", ".join(f"{float(w)!r}D" for w in vec) + ")"
        fold = (
            f"aggregate(zip_with(transform(`{e}`, x -> CAST(x AS DOUBLE)), "
            f"{lit_arr}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        dot = f"CASE WHEN size(`{e}`) = {dim} THEN 0.0D + {terms} ELSE {fold} END"
        cos = f"ROUND(({dot}) / (({norm_sql}) * {float(cnorm)!r}D), 6)"
        structs.append(f"named_struct('negcos', -({cos}), 'cell', {int(cell)})")
    return F.expr("array(" + ", ".join(structs) + ")")


def _assign_cell_expr(cents: list[tuple[int, list[float]]], emb_col: str = "embedding"):
    """Nearest-centroid cell id as a pure column expression (argmax
    cosine, ties → lowest cell).  ZERO exchange: ``array_min`` over the
    literal-scored struct array replaces the broadcast-join + groupBy
    the round-4 implementation paid once per Lloyd round."""
    return F.array_min(_cell_scores_expr(cents, emb_col))["cell"]


def probe_cells_expr(
    cents: list[tuple[int, list[float]]], emb_col: str, nprobe: int
):
    """The ``nprobe`` nearest cells (by centroid cosine, ties → lowest
    cell) as an array column — probe selection without a window or any
    exchange on the query side."""
    return F.transform(
        F.slice(F.array_sort(_cell_scores_expr(cents, emb_col)), 1, nprobe),
        lambda s: s["cell"],
    )


def _assign_cells(vecs: DataFrame, cent, out_col: str = "cell") -> DataFrame:
    """Nearest-centroid assignment by cosine — a pure projection over
    driver-literal centroids (see _assign_cell_expr): the corpus is
    never shuffled, joined, or aggregated to get its cell ids."""
    return vecs.withColumn(out_col, _assign_cell_expr(_centroid_list(cent)))


def ivf_train(corpus: DataFrame, *, n_cells: int = 8, iters: int = 3) -> DataFrame:
    """IVF coarse quantizer: Lloyd's k-means with a DETERMINISTIC
    hash-sharded init (cell 0..n-1 seeded by the mean of vecs with
    ``pmod(xxhash64(vec_id), n) = cell`` — spread across the corpus, no
    RNG, reproducible on any engine/run).  Element-wise centroid means
    are UDF-free: posexplode the vectors, average per (cell, position),
    re-assemble with array_agg sorted by position.

    Scale: each Lloyd round is one PROJECTION pass (cell assignment over
    driver-literal centroids — zero exchange of the corpus,
    _assign_cell_expr) + one (cell, pos)-keyed mean aggregation whose
    map-side combine reduces each task to ≤ n_cells × dim rows before
    the (tiny) exchange.  At 10^10 vectors you train on a deterministic
    hash sample (``pmod(xxhash64(vec_id), S) = 0``) and only ASSIGN the
    full corpus once; the centroid set stays n_cells × dim doubles —
    kilobytes — at any corpus size.  Returns (cell, centroid)."""
    def _means(assigned: DataFrame) -> DataFrame:
        pos = assigned.select(
            "cell", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
        )
        return (
            pos.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )

    # seed hash is SALTED so it decorrelates from hash-based train
    # sampling (pmod(xxhash64(vec_id), S) = 0 would otherwise constrain
    # pmod(xxhash64(vec_id), n_cells) to a coset and leave cells unseeded)
    seeded = corpus.withColumn(
        "cell",
        F.pmod(F.xxhash64(F.lit("ivf-seed"), F.col("vec_id")), F.lit(n_cells)).cast(
            "int"
        ),
    )
    cent = _means(seeded).localCheckpoint()
    for _ in range(iters):
        assigned = _assign_cells(corpus, cent)
        # a centroid that loses all members keeps its previous position
        # (left join fills the gap), so cells never collapse away
        new = _means(assigned)
        cent = (
            cent.select("cell", F.col("centroid").alias("prev"))
            .join(new, "cell", "left")
            .select("cell", F.coalesce("centroid", "prev").alias("centroid"))
            .localCheckpoint()  # iterative plan: truncate lineage per round
        )
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    n_cells: int = 8,
    iters: int = 3,
    nprobe: int = 3,
    k: int = 5,
) -> DataFrame:
    """IVF approximate top-k: train the coarse quantizer, bucket the
    corpus by nearest centroid, probe each query's ``nprobe`` nearest
    cells, brute-force ONLY within the probed cells.  Work per query
    drops from O(N) to O(N · nprobe / n_cells); recall vs the exact
    scan is pytest-measured (tests/test_training_ops.py).  Same output
    shape as brute_force_topk."""
    cents = _centroid_list(ivf_train(corpus, n_cells=n_cells, iters=iters))
    bucketed = corpus.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    ).withColumn("cell", _assign_cell_expr(cents, "c_emb"))
    qs = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # probe selection is a projection (no window/exchange); the probe
    # set (queries × nprobe rows) broadcasts, so the corpus side never
    # shuffles — the join's build side is always the tiny one
    probes = qs.select(
        "query_id",
        "q_emb",
        F.explode(probe_cells_expr(cents, "q_emb", nprobe)).alias("cell"),
    )
    scored = (
        bucketed.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_expr(as_double(F.col("q_emb")), as_double(F.col("c_emb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def cosine_neardup_pairs(corpus: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, bounded corpus).
    Norms precomputed per side, pair dot unrolled (dot_fast) — same
    values, codegen speed; widen() parallelizes the streamed side of the
    quadratic nested-loop join."""
    a = widen(corpus).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        norm_fast("embedding").alias("na"),
    )
    b = corpus.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        norm_fast("embedding").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot_fast("ea", "eb") / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# -- oracle-paired queries ---------------------------------------------------


def q_ann_cosine_topk(spark, sf):
    emb = tbl(spark, sf, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


def q_dedup_embedding(spark, sf):
    # synthetic embeddings are near-orthogonal (cos ∈ [-0.5, 0.5]); 0.4
    # marks the top ~0.05% of pairs as "near-dups" so the operator's
    # pair set is non-trivial at every sf
    return cosine_neardup_pairs(
        tbl(spark, sf, "embeddings").filter(F.col("vec_id") < 300), threshold=0.4
    )


def q_ann_lsh_sig(spark, sf):
    """LSH signatures are oracle-verifiable (pure hash algebra); the
    bucket-join recall is pytest-verified (⊘)."""
    e = tbl(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    return e.select("vec_id", lsh_signature_expr(F.col("embedding")).alias("sig"))


def q_ann_ivf_topk(spark, sf):
    """IVF probe search (op 99) — approximate by design, so rows-only
    for the driver; recall vs the exact brute-force scan is
    pytest-measured (tests/test_training_ops.py)."""
    emb = tbl(spark, sf, "embeddings").filter(F.col("vec_id") < 400)
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), n_cells=8, nprobe=3, k=5)


def _fold_dot_sql(a: str, b: str) -> str:
    return f"list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), (x, y) -> x + y)"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round({_fold_dot_sql(a, b)} / "
        f"(sqrt({_fold_dot_sql(a, a)}) * sqrt({_fold_dot_sql(b, b)})), 6)"
    )


def _lsh_sig_oracle(bits: int = LSH_BITS, stride: int = LSH_DIM_STRIDE) -> str:
    terms = []
    for i in range(bits):
        lo = i * stride + 1
        weights = ", ".join(
            f"CASE WHEN ('0x' || substr(md5(concat_ws(',', 'hp', {j})), 1, 15))::BIGINT % 2 = 1 THEN 1.0 ELSE -1.0 END"
            for j in range(i * stride, (i + 1) * stride)
        )
        proj = (
            f"list_reduce(list_transform(list_zip((e[{lo}:{lo + stride - 1}])::DOUBLE[], "
            f"[{weights}]), p -> p[1] * p[2]), (x, y) -> x + y)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {2**i} ELSE 0 END")
    return f"""
        WITH t AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id < 200)
        SELECT vec_id, CAST({' + '.join(terms)} AS BIGINT) AS sig FROM t
    """


ORACLE = {
    "ann_cosine_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT query_id, c.vec_id AS cand_id,
                   {_cos_sql('qe', 'c.embedding::DOUBLE[]')} AS cos
            FROM q JOIN embeddings c ON c.vec_id <> query_id
        )
        SELECT query_id, cand_id, cos, CAST(rnk AS INT) AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, cand_id) AS rnk
            FROM scored) WHERE rnk <= 5
    """,
    "dedup_embedding": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_cos_sql('a.embedding::DOUBLE[]', 'b.embedding::DOUBLE[]')} AS cos
        FROM (SELECT * FROM embeddings WHERE vec_id < 300) a
        JOIN (SELECT * FROM embeddings WHERE vec_id < 300) b ON a.vec_id < b.vec_id
        WHERE {_cos_sql('a.embedding::DOUBLE[]', 'b.embedding::DOUBLE[]')} >= 0.4
    """,
    "ann_lsh_sig": _lsh_sig_oracle(),
}

QUERIES = {
    "ann_cosine_topk": q_ann_cosine_topk,
    "dedup_embedding": q_dedup_embedding,
    "ann_lsh_sig": q_ann_lsh_sig,
    "ann_ivf_topk": q_ann_ivf_topk,
}
