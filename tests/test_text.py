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
