from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.oracle.span_ref import duplicate_spans_ref


def _run(spark, docs: dict[int, list[int]], span_len: int, min_count: int = 2):
    from lazyosm_spark.operators.spans import duplicate_spans

    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs.items()], "doc_id int, token_ids array<int>"
    )
    rows = duplicate_spans(
        df, span_len=span_len, min_count=min_count
    ).collect()
    return {r["doc_id"]: r for r in rows}


def _check(spark, docs, span_len, min_count=2):
    got = _run(spark, docs, span_len, min_count)
    ref = duplicate_spans_ref(docs, span_len, min_count)
    assert set(got) == set(ref)
    for d, (n_tok, n_dup, dup_toks) in ref.items():
        r = got[d]
        assert (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"]) == (
            n_tok,
            n_dup,
            dup_toks,
        ), f"doc {d}"
        want_frac = dup_toks / n_tok if n_tok else 0.0
        assert r["dup_frac"] == pytest.approx(want_frac, abs=0)


def test_cross_doc_and_overlap(spark):
    # docs 1/2 share [5,6,7,8]; doc 1 has two OVERLAPPING dup spans
    # whose coverage must union, not sum
    docs = {
        1: [5, 6, 7, 8, 9, 5, 6, 7, 8],
        2: [1, 5, 6, 7, 8, 2],
        3: [9, 9, 9],
    }
    _check(spark, docs, span_len=4)


def test_within_doc_repeat_counts(spark):
    # the repeated span lives entirely inside one doc — still duplicated
    docs = {1: [1, 2, 3, 0, 1, 2, 3], 2: [7, 8, 9]}
    got = _run(spark, docs, span_len=3)
    assert got[1]["n_dup_spans"] == 2
    assert got[2]["n_dup_spans"] == 0
    _check(spark, docs, span_len=3)


def test_short_and_empty_docs(spark):
    docs = {1: [], 2: [1, 2], 3: [1, 2, 3], 4: [1, 2, 3]}
    got = _run(spark, docs, span_len=3)
    assert got[1]["n_tokens"] == 0 and got[1]["dup_frac"] == 0.0
    assert got[2]["n_dup_spans"] == 0  # shorter than span_len
    assert got[3]["dup_frac"] == 1.0 and got[4]["dup_frac"] == 1.0
    _check(spark, docs, span_len=3)


def test_min_count_threshold(spark):
    docs = {1: [1, 2, 3], 2: [1, 2, 3], 3: [1, 2, 3]}
    assert _run(spark, docs, 3, min_count=3)[1]["n_dup_spans"] == 1
    assert _run(spark, docs, 3, min_count=4)[1]["n_dup_spans"] == 0
    _check(spark, docs, 3, min_count=3)


def test_randomized_vs_oracle(spark):
    rng = random.Random(42)
    # small alphabet so L=4 spans collide organically
    docs = {
        d: [rng.randrange(6) for _ in range(rng.randrange(0, 40))]
        for d in range(60)
    }
    _check(spark, docs, span_len=4)
    _check(spark, docs, span_len=7, min_count=3)


def test_sql_twin_matches_engine(spark, tmp_path):
    import duckdb

    rng = random.Random(7)
    docs = {
        d: [rng.randrange(5) for _ in range(rng.randrange(4, 30))]
        for d in range(40)
    }
    from lazyosm_spark.operators.spans import duplicate_spans, duplicate_spans_sql

    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs.items()], "doc_id int, token_ids array<int>"
    )
    eng = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"], r["dup_frac"])
        for r in duplicate_spans(df, span_len=5).collect()
    }
    p = str(tmp_path / "toks.parquet")
    df.select("doc_id", F.col("token_ids").alias("ids")).toPandas().to_parquet(p)
    sql = duplicate_spans_sql(f"read_parquet('{p}')", span_len=5)
    dd = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert eng == dd


def _run_contam(spark, docs, eval_docs, span_len):
    from lazyosm_spark.operators.spans import contamination

    mk = lambda d: spark.createDataFrame(
        [(i, ids) for i, ids in d.items()], "doc_id int, token_ids array<int>"
    )
    rows = contamination(mk(docs), mk(eval_docs), span_len=span_len).collect()
    return {r["doc_id"]: r for r in rows}


def test_contamination_vs_oracle(spark):
    from tests.oracle.span_ref import contamination_ref

    docs = {
        1: [1, 2, 3, 4, 5, 6],  # contains eval span [3,4,5]
        2: [9, 9, 9, 9],  # clean
        3: [3, 4, 5, 0, 3, 4, 5],  # two overlapping-free hits
        4: [],
        5: [3, 4],  # shorter than span
    }
    eval_docs = {100: [0, 3, 4, 5, 7]}
    got = _run_contam(spark, docs, eval_docs, 3)
    ref = contamination_ref(docs, eval_docs, 3)
    assert set(got) == set(ref)
    for d, (nt, nh, ht) in ref.items():
        r = got[d]
        assert (r["n_tokens"], r["n_hit_spans"], r["hit_tokens"]) == (nt, nh, ht)
    assert got[1]["n_hit_spans"] == 1 and got[2]["n_hit_spans"] == 0
    # doc 3 hits [3,4,5] at 0 and 4 AND [0,3,4] at 3 -> union covers all 7
    assert got[3]["n_hit_spans"] == 3 and got[3]["hit_tokens"] == 7


def test_contamination_randomized(spark):
    import random

    from tests.oracle.span_ref import contamination_ref

    rng = random.Random(5)
    docs = {
        d: [rng.randrange(5) for _ in range(rng.randrange(0, 30))]
        for d in range(50)
    }
    eval_docs = {1000 + d: [rng.randrange(5) for _ in range(15)] for d in range(5)}
    got = _run_contam(spark, docs, eval_docs, 4)
    ref = contamination_ref(docs, eval_docs, 4)
    for d, (nt, nh, ht) in ref.items():
        r = got[d]
        assert (r["n_tokens"], r["n_hit_spans"], r["hit_tokens"]) == (nt, nh, ht), d


def test_contamination_sql_twin(spark, tmp_path):
    import random

    import duckdb

    from lazyosm_spark.operators.spans import contamination, contamination_sql

    rng = random.Random(9)
    docs = {
        d: [rng.randrange(4) for _ in range(rng.randrange(4, 25))]
        for d in range(30)
    }
    eval_docs = {500 + d: [rng.randrange(4) for _ in range(12)] for d in range(3)}
    mk = lambda d: spark.createDataFrame(
        [(i, ids) for i, ids in d.items()], "doc_id int, token_ids array<int>"
    )
    eng = {
        r["doc_id"]: tuple(r)[1:]
        for r in contamination(mk(docs), mk(eval_docs), span_len=4).collect()
    }
    pc, pe = str(tmp_path / "c.parquet"), str(tmp_path / "e.parquet")
    mk(docs).selectExpr("doc_id", "token_ids as ids").toPandas().to_parquet(pc)
    mk(eval_docs).selectExpr("doc_id", "token_ids as ids").toPandas().to_parquet(pe)
    sql = contamination_sql(f"read_parquet('{pc}')", f"read_parquet('{pe}')", span_len=4)
    dd = {r[0]: tuple(r[1:]) for r in duckdb.connect().execute(sql).fetchall()}
    assert eng == dd


def test_sizes_hint_path_identical(spark):
    from lazyosm_spark.operators.spans import duplicate_spans

    docs = {1: [1, 2, 3, 4, 1, 2, 3], 2: [1, 2, 3], 3: []}
    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs.items()], "doc_id int, token_ids array<int>"
    )
    sizes = df.select("doc_id", F.size("token_ids").cast("long").alias("n_tokens"))
    a = sorted(map(tuple, duplicate_spans(df, span_len=3).collect()))
    b = sorted(map(tuple, duplicate_spans(df, span_len=3, sizes=sizes).collect()))
    assert a == b


def test_validation(spark):
    from lazyosm_spark.operators.spans import duplicate_spans

    df = spark.createDataFrame([(1, [1])], "doc_id int, token_ids array<int>")
    with pytest.raises(ValueError):
        duplicate_spans(df, span_len=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)
