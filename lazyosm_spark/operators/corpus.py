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

At scale the DEFAULT legs (quality, langid, exact-dedup representative,
optional PII bound) are ONE text scan + ONE shuffle: all four signals
are map-side expressions computed in a single projection, and the
representative rule is a window min over the text hash (r6 — the
previous shape joined three separately-scanned frames back on doc_id).
The aggregation-bearing optional legs (repetition, span dedup, near-dup
clustering) remain one-shuffle semi-joins on doc_id.
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
    from pyspark.sql import Window

    from lazyosm_spark.operators.dedup import normalize_text
    from lazyosm_spark.functions.hashing import md5_long

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    # SINGLE-PASS curate (r6, guide §2.3/§2.4): quality, langid, the
    # exact-dedup text hash, and (when requested) the PII hit count are
    # all map-side expressions over the same text, so one projection
    # computes them together — the previous shape built three separate
    # frames and joined them back on doc_id (3 text scans + 3 shuffles;
    # measured 22-30 s of a 40 s corpus_make run at 10^6 docs).  The
    # dedup-representative rule (keep the min doc_id of each
    # normalized-text group, computed over the FULL corpus before any
    # quality/lang filtering — unchanged semantics) becomes a window
    # min over the hash: ONE shuffle total for the default legs.
    base_cols = [
        F.col("doc_id"),
        _text.quality_exprs("text")["quality"].alias("quality"),
        _text.langid_exprs("text")["lang_pred"].alias("lang_pred"),
        md5_long(normalize_text("text")).alias("_text_hash"),
    ]
    if max_pii is not None:
        # counted over the FULL corpus on purpose (pre-filter), same
        # as the previous semi-join leg
        base_cols.append(_text.pii_chain_exprs("text")[2].alias("_n_pii"))
    base = d.select(*base_cols)
    w = Window.partitionBy("_text_hash")
    out = (
        base.withColumn("_rep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_rep_id"))
        .filter(
            (F.col("quality") >= F.lit(min_quality))
            & F.col("lang_pred").isin(*langs)
        )
    )
    if max_pii is not None:
        out = out.filter(F.col("_n_pii") <= max_pii)
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

        # materialize the tokenize output ONCE: duplicate_spans consumes
        # it twice (span stream + sizes), and the sizes "hint" derived
        # from the LIVE tokenize plan re-ran the BPE UDF for the second
        # leg (ADVICE r5) — a checkpoint makes both legs read a
        # two-column scan of the materialized frame instead
        toks = tokenize(d).localCheckpoint(eager=True)
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
