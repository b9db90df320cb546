"""Text-analysis operators for training-data pipelines over the
``documents`` table: language-ID, quality scoring, token counting,
document fingerprinting.  All pure column expressions (JVM-side,
whole-stage-codegen) — no Python UDFs, so they run at full scan speed
on 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import tbl

# tiny, fixed English function-word list — enough signal for a
# heuristic n-gram-free language ID on synthetic corpora
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "for",
    "on", "with", "as", "by", "at", "it", "this", "that", "are", "be",
)


def tokens_expr(col):
    """Whitespace tokenization with empty-string safety."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def token_count_expr(col):
    return F.size(tokens_expr(col))


def bpe_ish_count_expr(col):
    """BPE-ish subword proxy: count of letter-runs, digit-runs and
    punctuation marks (a cheap, deterministic token estimator)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_exprs(col):
    n_chars = F.length(col)
    toks = tokens_expr(col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    safe_tok = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(None))
    safe_chr = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(None))
    return {
        "n_chars_m": n_chars.cast("long"),
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct.cast("double") / safe_chr, 6),
        "stopword_ratio": F.round(n_stop.cast("double") / safe_tok, 6),
        "avg_token_len": F.round(
            (n_chars - (n_tokens - 1)).cast("double") / safe_tok, 6
        ),
    }


def langid_expr(col, threshold: float = 0.08):
    toks = tokens_expr(col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    ratio = F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint_expr(col):
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text (the doc-identity key for exact dedup)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


# -- oracle-paired queries ---------------------------------------------------


def q_text_tokens(spark, sf):
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_tokens"),
        bpe_ish_count_expr(F.col("text")).alias("n_subwords"),
    )


def q_text_quality(spark, sf):
    d = tbl(spark, sf, "documents")
    q = quality_exprs(F.col("text"))
    return d.select("doc_id", *[v.alias(k) for k, v in q.items()])


def q_text_langid(spark, sf):
    d = tbl(spark, sf, "documents")
    return d.select(
        "doc_id",
        "lang",
        langid_expr(F.col("text")).alias("lang_pred"),
    )


def q_text_fingerprint(spark, sf):
    d = tbl(spark, sf, "documents")
    return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))


_STOP_SQL = "(" + ",".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

_TOKENS = r"""
    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END
"""

ORACLE = {
    "text_tokens": f"""
        SELECT doc_id,
               CAST(len({_TOKENS}) AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subwords
        FROM documents
    """,
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   {_TOKENS} AS toks,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
            FROM documents
        )
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars_m,
               CAST(len(toks) AS INT) AS n_tokens,
               round(n_punct / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) END), 6) AS punct_ratio,
               round(len(list_filter(toks, x -> lower(x) IN {_STOP_SQL}))
                     / (CASE WHEN len(toks) > 0 THEN CAST(len(toks) AS DOUBLE) END), 6) AS stopword_ratio,
               round((n_chars - (len(toks) - 1))
                     / (CASE WHEN len(toks) > 0 THEN CAST(len(toks) AS DOUBLE) END), 6) AS avg_token_len
        FROM t
    """,
    "text_langid": f"""
        WITH t AS (SELECT doc_id, lang, {_TOKENS} AS toks FROM documents)
        SELECT doc_id, lang,
               CASE WHEN (CASE WHEN len(toks) > 0
                          THEN len(list_filter(toks, x -> lower(x) IN {_STOP_SQL})) / CAST(len(toks) AS DOUBLE)
                          ELSE 0.0 END) >= 0.08
                    THEN 'en' ELSE 'unk' END AS lang_pred
        FROM t
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    """,
}

QUERIES = {
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
}
