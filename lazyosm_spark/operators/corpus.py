"""End-to-end corpus curation: the composed training-data filter.

Real pipelines chain the individual operators — quality heuristics,
language id, exact dedup, near-dup grouping — into one "keep this
document?" decision.  ``filter_corpus`` is that composition as a single
declarative plan (each leg is the already-oracle-checked operator, so
the composition's DuckDB twin is the same SQL legs CTE-joined):

  keep(doc) =  quality  >= min_quality          (quality_score)
            AND lang_pred IN langs              (langid)
            AND doc is its exact-dedup group's  (exact_dedup)
                min-id representative
            [AND doc is its near-dup CLUSTER's  (minhash LSH ->
                 representative]                 connected components)

At scale every leg is one shuffle or less; the joins are all on doc_id
(co-partitioned after the first shuffle, AQE reuses the exchange).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.operators import dedup as _dedup
from lazyosm_spark.operators import text as _text


def filter_corpus(
    docs: DataFrame,
    min_quality: float = 0.25,
    langs: Sequence[str] = ("en",),
    near_dup_threshold: float | None = None,
    max_pii: int | None = None,
    max_top_bigram_frac: float | None = None,
    max_dup_ngram_frac: float | None = None,
    max_span_dup_frac: float | None = None,
    span_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, lang_pred, quality) of the documents that survive
    every filter.  ``near_dup_threshold`` (optional, e.g. 0.5) also
    drops non-representative members of minhash-LSH near-dup CLUSTERS
    (transitive, via connected components).  ``max_pii`` (optional)
    drops documents whose pii_scrub hit count exceeds it — the
    redaction-sweep leg, one more map-side expression chain.
    ``max_top_bigram_frac`` / ``max_dup_ngram_frac`` (optional) add
    the Gopher/C4 repetition leg (operators/repetition): drop docs
    whose modal bigram owns more than the given share of bigram slots
    or whose duplicated-trigram word coverage exceeds the bound — one
    shared repetition_stats pass when either is set.
    ``max_span_dup_frac`` (optional) adds the Lee-et-al corpus-wide
    span-dedup leg (operators/spans): BPE-tokenize the corpus and drop
    docs whose duplicated ``span_len``-token coverage exceeds the
    bound — the substring-level signal exact dedup and near-dup
    clustering both miss (a doc can be 60% copied without any whole
    near-duplicate)."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    q = _text.quality_score(d).select("doc_id", "quality")
    lang = _text.langid(d).select("doc_id", "lang_pred")
    reps = _dedup.exact_dedup(d).select("doc_id")

    out = (
        d.select("doc_id")
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .join(reps, "doc_id", "left_semi")
        .filter(
            (F.col("quality") >= F.lit(min_quality))
            & F.col("lang_pred").isin(*langs)
        )
    )
    if max_pii is not None:
        # counted over the FULL corpus on purpose: the chain is pure
        # map-side expressions (no shuffle), and restricting it to the
        # quality/lang survivors would re-evaluate those legs a second
        # time (or force caching `out`) for a workload-dependent win
        pii = _text.pii_scrub(d).select("doc_id", "n_pii")
        out = out.join(
            pii.filter(F.col("n_pii") <= max_pii).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    if max_top_bigram_frac is not None or max_dup_ngram_frac is not None:
        from lazyosm_spark.operators.repetition import repetition_stats

        rep = repetition_stats(d)
        cond = F.lit(True)
        if max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac") <= F.lit(max_top_bigram_frac))
        if max_dup_ngram_frac is not None:
            cond = cond & (
                F.col("dup_ngram_word_frac") <= F.lit(max_dup_ngram_frac)
            )
        out = out.join(rep.filter(cond).select("doc_id"), "doc_id", "left_semi")
    if max_span_dup_frac is not None:
        from lazyosm_spark.operators.spans import duplicate_spans
        from lazyosm_spark.operators.tokenize import tokenize

        toks = tokenize(d)
        spans = duplicate_spans(
            toks.select("doc_id", "token_ids"),
            span_len=span_len,
            sizes=toks.select("doc_id", "n_tokens"),
        )
        out = out.join(
            spans.filter(F.col("dup_frac") <= F.lit(max_span_dup_frac)).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
    if near_dup_threshold is not None:
        from lazyosm_spark.operators.graph import dedup_representatives

        edges = _dedup.minhash_lsh_pairs(
            d, jaccard_threshold=near_dup_threshold
        ).select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))
        keep = dedup_representatives(d.select("doc_id"), edges, node_col="doc_id")
        out = out.join(
            keep.filter("is_representative").select(F.col("id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
    return out.select("doc_id", "lang_pred", "quality")
