"""Winnowing fingerprints: the vectorized Arrow path must be
bit-identical to the JVM-expression formula twin, including degenerate
inputs; the winnowing guarantee holds for overlapping documents."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_winnow_vectorized_equals_expression(spark):
    from lazyosm_spark.operators.text import (
        winnow_fingerprints,
        winnow_fingerprints_expr,
    )

    # the expression twin re-evaluates the hash array per window (the
    # documented slow path) — 60 docs keeps the pin under ~30s
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 60")
    )
    extra = spark.createDataFrame(
        [
            (90001, ""),
            (90002, "   "),
            (90003, "one two"),                      # < k tokens
            (90004, "a b c d e"),                    # k grams but < k+w-1
            (90005, "w x y z w x y z w x y z"),      # repeats -> distinct
        ],
        "doc_id long, text string",
    )
    both = docs.unionByName(extra)
    fast = {r["doc_id"]: (r["n_fp"], r["fp_seq"]) for r in winnow_fingerprints(both).collect()}
    slow = {r["doc_id"]: (r["n_fp"], r["fp_seq"]) for r in winnow_fingerprints_expr(both).collect()}
    assert fast == slow
    assert fast[90001] == (0, "") and fast[90003] == (0, "")


def test_filter_corpus_composition(spark):
    """Each leg of the composed filter bites, survivors satisfy every
    predicate, and near-dup clustering keeps exactly one representative
    per duplicate group."""
    from pyspark.sql import functions as F

    from lazyosm_spark.operators.corpus import filter_corpus
    from lazyosm_spark.operators.text import langid, quality_score

    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    dup_text = base.filter("doc_id = 0").first()["text"]
    extra = spark.createDataFrame(
        [(70001, dup_text), (70002, "zz qq ww")],  # exact dup + junk
        "doc_id long, text string",
    )
    docs = base.unionByName(extra)
    out = filter_corpus(docs, min_quality=0.25, langs=("en",), near_dup_threshold=0.5)
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 < len(kept) < docs.count()
    assert 70001 not in kept and 70002 not in kept  # dup loses to min-id; junk fails quality
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    lang = {r["doc_id"]: r["lang_pred"] for r in langid(docs).collect()}
    assert all(q[i] >= 0.25 and lang[i] == "en" for i in kept)


def test_winnow_guarantee_shared_fingerprint(spark):
    """Documents sharing a >= w+k-1 token run must share at least one
    fingerprint (the SWA detection guarantee)."""
    from lazyosm_spark.operators.text import winnow_fingerprints

    common = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+3-1
    docs = spark.createDataFrame(
        [
            (1, f"unrelated prefix words here {common} and a suffix"),
            (2, f"{common} totally different tail content follows now"),
            (3, "no overlap with the others at all in any way"),
        ],
        "doc_id long, text string",
    )
    fp = {
        r["doc_id"]: set(r["fp_seq"].split(",")) if r["fp_seq"] else set()
        for r in winnow_fingerprints(docs).collect()
    }
    assert fp[1] & fp[2]
    assert not (fp[1] & fp[3] and fp[2] & fp[3])


def test_pii_scrub_counts_and_redaction(spark):
    """Deterministic injected PII is counted per pattern and fully
    redacted — a second sweep over clean_text finds zero hits."""
    from pyspark.sql import functions as F

    from lazyosm_spark.operators.text import pii_scrub
    from lazyosm_spark.plans.driver_queries import _pii_injected

    docs = _pii_injected(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    out = pii_scrub(docs)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows:
        d = r["doc_id"]
        assert r["n_email"] == 1 and r["n_ipv4"] == 1, r
        assert r["n_ssn"] == (1 if d % 3 == 0 else 0), r
        assert r["n_phone"] == (1 if d % 5 == 0 else 0), r
        assert r["n_pii"] == r["n_email"] + r["n_ssn"] + r["n_ipv4"] + r["n_phone"]
        assert "<EMAIL>" in r["clean_text"] and "<IP>" in r["clean_text"]
    # idempotence: rescrubbing the redacted text finds nothing
    again = pii_scrub(out.select("doc_id", F.col("clean_text").alias("text")))
    assert again.agg(F.sum("n_pii")).first()[0] == 0


def test_filter_corpus_max_pii_leg(spark):
    """max_pii composes into filter_corpus: docs with > max_pii hits
    (here exactly the doc_id % 15 == 0 ones, 4 injected hits) drop out
    relative to the same filter without the leg."""
    from lazyosm_spark.operators.corpus import filter_corpus
    from lazyosm_spark.plans.driver_queries import _pii_injected

    docs = _pii_injected(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    base = {r["doc_id"] for r in filter_corpus(docs, min_quality=0.0, langs=("en", "de", "fr")).collect()}
    kept = {
        r["doc_id"]
        for r in filter_corpus(
            docs, min_quality=0.0, langs=("en", "de", "fr"), max_pii=3
        ).collect()
    }
    assert kept == {d for d in base if d % 15 != 0}
    assert len(base) > len(kept)


def test_filter_corpus_repetition_leg(spark):
    """The repetition bounds compose into filter_corpus: exactly the
    docs exceeding either threshold (per repetition_stats itself) drop
    relative to the same filter without the leg."""
    from lazyosm_spark.operators.corpus import filter_corpus
    from lazyosm_spark.operators.repetition import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        r["doc_id"]
        for r in filter_corpus(
            docs, min_quality=0.0, langs=("en", "de", "fr")
        ).collect()
    }
    kept = {
        r["doc_id"]
        for r in filter_corpus(
            docs,
            min_quality=0.0,
            langs=("en", "de", "fr"),
            max_top_bigram_frac=0.05,
            max_dup_ngram_frac=0.1,
        ).collect()
    }
    ok = {
        r["doc_id"]
        for r in repetition_stats(docs)
        .filter("top_bigram_frac <= 0.05 AND dup_ngram_word_frac <= 0.1")
        .collect()
    }
    assert kept == base & ok
    assert len(base) > len(kept)


def test_filter_corpus_span_dedup_leg(spark):
    """The span-dedup bound composes into filter_corpus: exactly the
    docs whose duplicated-span coverage exceeds the threshold (per
    tokenize + duplicate_spans themselves) drop relative to the same
    filter without the leg."""
    from lazyosm_spark.operators.corpus import filter_corpus
    from lazyosm_spark.operators.spans import duplicate_spans
    from lazyosm_spark.operators.tokenize import tokenize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        r["doc_id"]
        for r in filter_corpus(
            docs, min_quality=0.0, langs=("en", "de", "fr")
        ).collect()
    }
    kept = {
        r["doc_id"]
        for r in filter_corpus(
            docs,
            min_quality=0.0,
            langs=("en", "de", "fr"),
            max_span_dup_frac=0.5,
            span_len=8,
        ).collect()
    }
    ok = {
        r["doc_id"]
        for r in duplicate_spans(tokenize(docs), span_len=8)
        .filter("dup_frac <= 0.5")
        .collect()
    }
    assert kept == base & ok
    assert len(base) > len(kept)
