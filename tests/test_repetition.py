from __future__ import annotations

import random

import pytest

from tests.oracle.repetition_ref import repetition_stats_ref

COLS = [
    "n_words",
    "n_lines",
    "dup_line_frac",
    "dup_line_char_frac",
    "top_bigram_frac",
    "dup_ngram_word_frac",
]


def _run(spark, texts: dict[int, str], ngram_n: int = 3):
    from lazyosm_spark.operators.repetition import repetition_stats

    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id int, text string"
    )
    return {
        r["doc_id"]: r for r in repetition_stats(df, ngram_n=ngram_n).collect()
    }


def _check(spark, texts, ngram_n=3):
    got = _run(spark, texts, ngram_n)
    assert set(got) == set(texts)
    for d, t in texts.items():
        ref = repetition_stats_ref(t, ngram_n)
        for c in COLS:
            assert got[d][c] == pytest.approx(ref[c], abs=0), f"doc {d} col {c}"


def test_duplicate_lines(spark):
    texts = {
        1: "alpha beta\ngamma\nalpha beta\n  \ndelta",
        2: "one line only",
        3: "x\nx\nx",
    }
    _check(spark, texts)
    got = _run(spark, texts)
    assert got[1]["n_lines"] == 4  # blank line dropped
    assert got[1]["dup_line_frac"] == pytest.approx(0.5)
    assert got[3]["dup_line_frac"] == 1.0 and got[3]["dup_line_char_frac"] == 1.0


def test_top_bigram_dominance(spark):
    texts = {
        1: "spam ham spam ham spam ham",  # "spam ham" owns 3/5 slots
        2: "all words here differ fully",
        3: "single",
        4: "",
    }
    _check(spark, texts)
    got = _run(spark, texts)
    assert got[1]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 4)
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[4]["n_words"] == 0 and got[4]["top_bigram_frac"] == 0.0


def test_dup_ngram_coverage_union(spark):
    # "a b c" repeats; overlapping duplicated trigrams must union
    texts = {1: "a b c d a b c", 2: "p q r s t"}
    _check(spark, texts)
    got = _run(spark, texts)
    assert got[1]["dup_ngram_word_frac"] == pytest.approx(6 / 7)
    assert got[2]["dup_ngram_word_frac"] == 0.0


def test_normalization_shared_with_dedup(spark):
    # mixed case + repeated whitespace normalize before word metrics
    texts = {1: "Foo  BAR foo bar FOO Bar"}
    _check(spark, texts)
    assert _run(spark, texts)[1]["top_bigram_frac"] == pytest.approx(3 / 5)


def test_randomized_vs_oracle(spark):
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {}
    for d in range(50):
        n_lines = rng.randrange(0, 6)
        lines = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
            for _ in range(n_lines)
        ]
        if lines and rng.random() < 0.5:
            lines.append(rng.choice(lines))  # force a dup line sometimes
        texts[d] = "\n".join(lines)
    _check(spark, texts)
    _check(spark, texts, ngram_n=2)


def test_sql_twin_matches_engine(spark, tmp_path):
    import duckdb

    from lazyosm_spark.operators.repetition import (
        repetition_stats,
        repetition_stats_sql,
    )

    rng = random.Random(3)
    vocab = ["x", "yy", "zzz"]
    texts = {
        d: "\n".join(
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 10)))
            for _ in range(rng.randrange(1, 5))
        )
        for d in range(30)
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id int, text string"
    )
    eng = {
        r["doc_id"]: tuple(r[c] for c in COLS)
        for r in repetition_stats(df).collect()
    }
    p = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(p)
    sql = repetition_stats_sql(f"read_parquet('{p}')")
    dd = {r[0]: tuple(r[1:]) for r in duckdb.connect().execute(sql).fetchall()}
    assert eng == dd


def test_nonspace_whitespace_edges(spark):
    """Trailing newlines / tab padding must not create phantom words
    or distinct lines (Spark trim strips spaces only — the operator
    regex-trims so the oracle's str.strip semantics hold)."""
    texts = {
        1: "foo bar\n",          # trailing newline: 2 words, not 3
        2: "\tfoo bar\t\nfoo bar",  # tab-padded line == its clean twin
        3: "\n\t \n",            # whitespace-only: zero words/lines
    }
    _check(spark, texts)
    got = _run(spark, texts)
    assert got[1]["n_words"] == 2 and got[1]["top_bigram_frac"] == 1.0
    assert got[2]["dup_line_frac"] == 1.0
    assert got[3]["n_words"] == 0 and got[3]["n_lines"] == 0


def test_validation(spark):
    from lazyosm_spark.operators.repetition import repetition_stats

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        repetition_stats(df, ngram_n=1)
