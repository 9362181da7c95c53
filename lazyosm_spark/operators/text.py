"""Text analysis for training-data pipelines over ``documents``.

All JVM-side (split/regexp/aggregate) — no Python UDFs — and each has a
DuckDB-oracle SQL twin in __spark_entry__ so the driver value-checks it.

- token_stats    : whitespace tokens + BPE-ish word-piece count
- quality_score  : length / punctuation / stopword-ratio heuristics
- langid         : stopword-hit language scoring (en/de/fr heuristic)
- fingerprint    : polynomial rolling hash over normalized tokens
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.functions.hashing import md5_long
from lazyosm_spark.operators.dedup import normalize_text

# tiny stopword inventories for the heuristic langid
STOP = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
}

# rolling-hash modulus kept below 2^31 so acc*base + 60-bit-hash never
# overflows int64 (the same expression must run in DuckDB BIGINTs)
_FP_BASE = 131
_FP_MOD = (1 << 31) - 1


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, n_wordpieces, avg_token_len).

    n_wordpieces is a BPE-ish proxy: alphanumeric runs + punctuation
    marks each count as a piece (regexp-count, shared with the oracle).
    """
    toks = F.split(normalize_text(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))
        .cast("long")
        .alias("n_wordpieces"),
        (
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, len_score, punct_ratio, stop_ratio, quality).

    quality = len_score * (1 - punct_ratio) * (0.5 + 0.5*stop_ratio) —
    a transparent, fully-SQL heuristic (each factor checkable)."""
    t = F.col(text_col)
    toks = F.split(normalize_text(text_col), " ")
    n_chars = F.length(t).cast("double")
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(STOP["en"]))
    ).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stop_hits / F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        len_score.alias("len_score"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        (len_score * (1 - punct_ratio) * (0.5 + 0.5 * stop_ratio)).alias("quality"),
    )


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit langid: score = hits/|tokens| per language, argmax
    wins (ties -> lexicographically first language). -> (doc_id,
    lang_pred, score)."""
    toks = F.split(normalize_text(text_col), " ")

    def in_words(ws: list[str]):
        # closure, NOT default-arg: 2-arg lambdas get the array index
        return lambda x: x.isin(ws)

    scored = F.array(
        *[
            F.struct(
                (
                    F.size(F.filter(toks, in_words(ws))).cast("double")
                    / F.greatest(F.size(toks).cast("double"), F.lit(1.0))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(STOP.items())
        ]
    )
    # deterministic winner: max score, ties -> lexicographically first
    # language (filter to the max score, then struct-sort gives lang asc)
    maxscore = F.array_max(F.transform(scored, lambda s: s["score"]))
    winners = F.filter(scored, lambda s: s["score"] == maxscore)
    best = F.element_at(F.array_sort(winners), 1)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("score"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over per-token md5 hashes, mod 2^61-1 (rolling-hash analog of the
    reference's per-block checksum role). -> (doc_id, fingerprint)."""
    toks = F.split(normalize_text(text_col), " ")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(_FP_BASE) + md5_long(t), F.lit(_FP_MOD)
        ).cast("long"),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
