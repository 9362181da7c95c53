"""Text analysis for training-data pipelines over ``documents``.

Each operator has a DuckDB-oracle SQL twin in __spark_entry__ so the
driver value-checks it.  token_stats/quality/langid/fingerprint are
pure JVM expressions (split/regexp/aggregate); winnow_fingerprints is
an Arrow-vectorized pandas UDF (its JVM-expression twin is kept as the
pinned formula spec — nested higher-order functions re-evaluate the
hash array per window, ~12x slower).

- token_stats         : whitespace tokens + BPE-ish word-piece count
- quality_score       : length / punctuation / stopword-ratio heuristics
- langid              : stopword-hit language scoring (en/de/fr heuristic)
- fingerprint         : polynomial rolling hash over normalized tokens
- winnow_fingerprints : SWA local fingerprinting (k-gram window minima)
"""

from __future__ import annotations

import numpy as np  # noqa: F401
import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
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


def quality_exprs(text_col: str = "text") -> dict[str, F.Column]:
    """The quality_score factors as named column EXPRESSIONS — pure
    map-side, so composite operators (filter_corpus's single-pass
    curate) can evaluate them alongside other signals in one scan
    instead of computing a separate frame and joining it back."""
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
    return {
        "len_score": len_score,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality": len_score * (1 - punct_ratio) * (0.5 + 0.5 * stop_ratio),
    }


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, len_score, punct_ratio, stop_ratio, quality).

    quality = len_score * (1 - punct_ratio) * (0.5 + 0.5*stop_ratio) —
    a transparent, fully-SQL heuristic (each factor checkable)."""
    qx = quality_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[qx[name].alias(name) for name in ("len_score", "punct_ratio", "stop_ratio", "quality")],
    )


def langid_exprs(text_col: str = "text") -> dict[str, F.Column]:
    """The langid winner as named column EXPRESSIONS (map-side
    composable, see quality_exprs)."""
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
    return {"lang_pred": best["lang"], "score": best["score"]}


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit langid: score = hits/|tokens| per language, argmax
    wins (ties -> lexicographically first language). -> (doc_id,
    lang_pred, score)."""
    lx = langid_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        lx["lang_pred"].alias("lang_pred"),
        lx["score"].alias("score"),
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


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer-Wilkerson-Aiken): positional word k-gram
    hashes -> minimum per sliding window of w -> distinct selected
    hashes = the document's fingerprint SET (guaranteed to share a
    fingerprint with any document overlapping by >= w+k-1 tokens).

    Vectorized Arrow path (the hot one): per batch, md5 the UNIQUE
    grams once, sliding-window minima via numpy stride tricks — the
    JVM-expression twin below re-evaluates the hash array per window
    element (nested higher-order functions; same trap as commit
    a9fc69d) and is kept only as the formula spec, pinned identical by
    pytest.  Tie order inside a window doesn't affect the VALUE set,
    so the paper's rightmost-min rule reduces to plain min.  Docs
    shorter than k + w - 1 tokens emit an empty set (oracle-identical).

    -> (doc_id, n_fp, fp_seq) with fp_seq = sorted fingerprints joined
    by ',' (portable across engines for the value hash)."""
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ws = _re.compile(r"\s+")

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_fp", T.LongType()),
                T.StructField("fp_seq", T.StringType()),
            ]
        )
    )
    def winnow(text: pd.Series) -> pd.DataFrame:
        vocab: dict[str, int] = {}
        gram_idx = []
        for t in text:
            toks = ws.sub(" ", (t or "").strip().lower()).split(" ")
            grams = [
                " ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))
            ]
            gram_idx.append(
                np.fromiter(
                    (vocab.setdefault(g, len(vocab)) for g in grams),
                    dtype=np.int64,
                    count=len(grams),
                )
            )
        hv = np.fromiter(
            (
                int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                for g in vocab
            ),
            dtype=np.int64,
            count=len(vocab),
        )
        n_fp, fp_seq = [], []
        for idx in gram_idx:
            if len(idx) < w:
                n_fp.append(0)
                fp_seq.append("")
                continue
            hs = hv[idx]
            mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
            fps = np.unique(mins)  # distinct + sorted
            n_fp.append(int(len(fps)))
            fp_seq.append(",".join(str(int(x)) for x in fps))
        return pd.DataFrame({"n_fp": n_fp, "fp_seq": fp_seq})

    st = winnow(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        st.getField("n_fp").alias("n_fp"),
        st.getField("fp_seq").alias("fp_seq"),
    )


def winnow_fingerprints_expr(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """JVM-expression winnowing twin (the formula spec; slow — nested
    HOFs re-evaluate the hash array per window)."""
    def seq1(n):
        # sequence(1, 0) DESCENDS in Spark ([1, 0]); an empty range
        # needs an explicit guard
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    toks = F.split(normalize_text(text_col), " ")
    n_grams = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    grams = F.transform(
        seq1(n_grams), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    hs = F.transform(grams, lambda g: md5_long(g))
    n_win = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(0))
    fps = F.array_distinct(
        F.transform(seq1(n_win), lambda i: F.array_min(F.slice(hs, i, w)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(fps).cast("long").alias("n_fp"),
        F.concat_ws(
            ",", F.transform(F.array_sort(fps), lambda x: x.cast("string"))
        ).alias("fp_seq"),
    )


# PII patterns, applied IN ORDER (earlier redactions keep later counts
# from double-counting: replacement tokens contain no digits or @).
# Portable regex subset — character classes, bounded quantifiers,
# non-capturing groups only — so Java (Spark) and RE2 (DuckDB) agree
# match-for-match; both engines use leftmost-first greedy semantics.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
    ("ipv4", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """PII redaction sweep (corpus-curation staple): sequential
    vectorized ``regexp_replace`` chain with a per-pattern hit count
    taken on the text AS EACH PATTERN SEES IT (post earlier
    redactions), all pure JVM expressions — no UDF, no shuffle,
    embarrassingly parallel at any scale.

    -> (id_col, clean_text, n_<pattern>..., n_pii).  The DuckDB twin
    is generated from the SAME pattern table (pii_scrub_sql), so the
    engines can never drift."""
    cur, counts, total = pii_chain_exprs(text_col, patterns)
    return docs.select(
        F.col(id_col),
        cur.alias("clean_text"),
        *counts,
        total.alias("n_pii"),
    )


def pii_chain_exprs(
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> tuple[F.Column, list[F.Column], F.Column]:
    """pii_scrub's redaction chain as EXPRESSIONS -> (clean_text,
    [n_<pattern> cols], n_pii total) — the one definition pii_scrub
    and filter_corpus's single-pass curate both evaluate."""
    counts = []
    cur = F.col(text_col)
    for name, pat, token in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return cur, counts, total.cast("long")


def pii_scrub_sql(
    text_sql: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> tuple[str, list[str]]:
    """DuckDB twin generator -> (clean_text_expr, [count_exprs...]),
    built from the same PII_PATTERNS table as the engine."""
    counts = []
    cur = text_sql
    for name, pat, token in patterns:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{p}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{p}', '{token}', 'g')"
    return cur, counts
