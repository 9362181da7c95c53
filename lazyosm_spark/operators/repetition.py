"""Repetition quality signals for corpus curation (Gopher/C4 family).

The standard web-corpus repetition filters (Rae et al. 2021 "Scaling
Language Models", §A1.2; Raffel et al. 2020 C4) measure how much of a
document is internally repeated: duplicated lines, the dominance of
the most frequent word bigram, and the fraction of words covered by
duplicated word n-grams.  `filter_corpus`-style pipelines threshold
these alongside quality_score / langid / dup_frac (operators/spans).

Per-doc definitions (pinned here AND in the DuckDB twin — both engines
compute formula-identical expressions):

- lines = raw text split on newline, trimmed, empties dropped;
  ``dup_line_frac`` = lines whose exact string occurs >= 2x in the doc
  / total lines; ``dup_line_char_frac`` = the same ratio in characters
  (every occurrence counted, the Gopher formulation).
- words = the engine's canonical normalization (lower + trim +
  collapse whitespace) split on single spaces; empty text -> no words.
- ``top_bigram_frac`` = occurrences of the modal word bigram / total
  bigram slots (n_words - 1) — how much of the doc the single most
  repeated pair owns.  Only the max count is needed, so no tie-break.
- ``dup_ngram_word_frac`` (n = ``ngram_n``, default 3) = words covered
  by the UNION of within-doc duplicated n-grams / n_words — the same
  lead()-window interval fold as operators/spans, in word units.

Design for 100 TB: every leg is explode -> count-window keyed on
(doc_id, item) -> per-doc aggregate — keys are per-document, so
cardinality is high and uniform (no skew possible by construction),
and each leg is exactly one shuffle plus a doc_id fold.  All string
work is JVM split/transform/concat inside codegen; no Python anywhere.

The reference has no text-quality machinery (engine growth beyond
reference parity, like tokenize/spans/streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lazyosm_spark.operators.dedup import normalize_text

_EMPTY_STR_ARR = "CAST(array() AS array<string>)"


def words_col(text_col: str) -> F.Column:
    """Normalized word array with Python-str.strip() edge semantics —
    the engine-wide definition of "the words of a document" (shared by
    repetition_stats and tokenize.word_counts).

    normalize_text's trim strips SPACES only (Spark/DuckDB trim
    semantics), so a trailing "\\n" or "\\t" would survive the collapse
    as a trailing space and split into a phantom "" word — the
    independent oracles (Python str.strip) have no such artifact.  A
    regex trim AFTER the whitespace collapse removes it in both
    engines identically; empty text yields an EMPTY array, not [""].
    """
    norm = F.regexp_replace(normalize_text(text_col), r"^ | $", "")
    return F.when(norm == "", F.expr(_EMPTY_STR_ARR)).otherwise(F.split(norm, " "))


_words_col = words_col  # internal alias (pre-existing call sites)


def words_sql(text_expr: str) -> str:
    """DuckDB twin of words_col — the one definition both
    repetition_stats_sql and the word_counts oracle build on."""
    norm = (
        f"regexp_replace(regexp_replace(trim(lower({text_expr})), "
        "'\\s+', ' ', 'g'), '^ | $', '', 'g')"
    )
    return (
        f"CASE WHEN {norm} = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({norm}, ' ') END"
    )


def _lines_col(text_col: str) -> F.Column:
    # regex trim, not F.trim: lines padded with tabs must compare
    # equal to their untabbed twins (the oracle strips all whitespace)
    return F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: x != "",
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
) -> DataFrame:
    """-> (doc_id, n_words, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_frac, dup_ngram_word_frac).  Docs with no lines / words
    report 0.0 for the corresponding fractions."""
    if ngram_n < 2:
        raise ValueError(f"ngram_n must be >= 2, got {ngram_n}")
    N = int(ngram_n)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _words_col(text_col).alias("w"),
        _lines_col(text_col).alias("lines"),
    )

    # --- lines: dup fraction by row and by characters -----------------
    la = base.select("doc_id", F.explode("lines").alias("line"))
    lc = la.withColumn(
        "cnt", F.count("*").over(Window.partitionBy("doc_id", "line"))
    )
    lagg = lc.groupBy("doc_id").agg(
        F.count("*").alias("n_l"),
        F.sum(F.length("line")).alias("chars"),
        F.count(F.when(F.col("cnt") >= 2, F.lit(1))).alias("dup_l"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= 2, F.length("line"))), F.lit(0)
        ).alias("dup_chars"),
    )

    # --- modal bigram dominance ---------------------------------------
    bigrams = F.expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
        f"ELSE {_EMPTY_STR_ARR} END"
    )
    bg = base.select("doc_id", F.explode(bigrams).alias("g"))
    bagg = (
        bg.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )

    # --- duplicated-n-gram word coverage (interval union) -------------
    ngrams = F.expr(
        f"CASE WHEN size(w) >= {N} THEN transform(sequence(1, size(w) - {N} + 1), "
        f"i -> struct(i AS pos, concat_ws(' ', slice(w, i, {N})) AS g)) "
        "ELSE CAST(array() AS array<struct<pos:int,g:string>>) END"
    )
    ng = base.select("doc_id", F.explode(ngrams).alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g")
    )
    nd = (
        ng.withColumn("cnt", F.count("*").over(Window.partitionBy("doc_id", "g")))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "pos")
    )
    nxt = F.lead("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
    nagg = (
        nd.withColumn(
            "covered",
            F.least(F.coalesce(nxt, F.col("pos") + N), F.col("pos") + N)
            - F.col("pos"),
        )
        .groupBy("doc_id")
        .agg(F.sum("covered").alias("cov"))
    )

    nl = F.coalesce("n_l", F.lit(0)).cast("long")
    chars = F.coalesce("chars", F.lit(0)).cast("long")
    nw = F.col("n_words")
    # narrow spine for the 3-way join: shipping the full word array
    # through the join exchanges just to take size(w) at the top would
    # shuffle the whole corpus text again
    spine = base.select("doc_id", F.size("w").cast("long").alias("n_words"))
    out = (
        spine.join(lagg, "doc_id", "left")
        .join(bagg, "doc_id", "left")
        .join(nagg, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        "n_words",
        nl.alias("n_lines"),
        F.when(nl > 0, F.col("dup_l").cast("double") / nl)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(chars > 0, F.col("dup_chars").cast("double") / chars)
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_frac"),
        F.when(
            nw >= 2, F.coalesce("max_c", F.lit(0)).cast("double") / (nw - 1)
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(nw > 0, F.coalesce("cov", F.lit(0)).cast("double") / nw)
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_word_frac"),
    )


def repetition_stats_sql(
    table: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
    ngram_n: int = 3,
) -> str:
    """DuckDB twin with formula-identical normalization, guards, and
    division order (same integer inputs -> bit-identical doubles)."""
    N = int(ngram_n)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         {words_sql(text_expr)} AS w,
         list_filter(list_transform(string_split({text_expr}, chr(10)),
                                    x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g')),
                     x -> x <> '') AS lines
  FROM {table}
),
la AS (SELECT doc_id, l AS line FROM base, UNNEST(lines) AS t(l)),
lc AS (SELECT doc_id, line, count(*) OVER (PARTITION BY doc_id, line) AS cnt FROM la),
lagg AS (
  SELECT doc_id, count(*) AS n_l, sum(len(line)) AS chars,
         count(*) FILTER (WHERE cnt >= 2) AS dup_l,
         coalesce(sum(len(line)) FILTER (WHERE cnt >= 2), 0) AS dup_chars
  FROM lc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
  FROM base, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
bagg AS (
  SELECT doc_id, max(c) AS max_c
  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g) GROUP BY doc_id
),
ng AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(w, i, i + {N} - 1), ' ') AS g
  FROM base, UNNEST(generate_series(1, len(w) - {N} + 1)) AS t(i)
  WHERE len(w) >= {N}
),
nd AS (
  SELECT doc_id, pos
  FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id, g) AS cnt FROM ng)
  WHERE cnt >= 2
),
nagg AS (
  SELECT doc_id, sum(covered) AS cov FROM (
    SELECT doc_id,
           least(coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                          pos + {N}), pos + {N}) - pos AS covered
    FROM nd) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(coalesce(l.n_l, 0) AS BIGINT) AS n_lines,
       CASE WHEN coalesce(l.n_l, 0) > 0
            THEN CAST(l.dup_l AS DOUBLE) / CAST(l.n_l AS BIGINT) ELSE 0.0 END AS dup_line_frac,
       CASE WHEN coalesce(l.chars, 0) > 0
            THEN CAST(l.dup_chars AS DOUBLE) / CAST(l.chars AS BIGINT) ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN len(b.w) >= 2
            THEN CAST(coalesce(g.max_c, 0) AS DOUBLE) / CAST(len(b.w) - 1 AS BIGINT) ELSE 0.0 END AS top_bigram_frac,
       CASE WHEN len(b.w) > 0
            THEN CAST(coalesce(n.cov, 0) AS DOUBLE) / CAST(len(b.w) AS BIGINT) ELSE 0.0 END AS dup_ngram_word_frac
FROM base b
LEFT JOIN lagg l ON b.doc_id = l.doc_id
LEFT JOIN bagg g ON b.doc_id = g.doc_id
LEFT JOIN nagg n ON b.doc_id = n.doc_id
"""
