"""ANN paths (LSH, IVF) measured against the exact oracles; dedup suite
cross-checks."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ivf_recall_vs_exact(spark):
    from lazyosm_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 25)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, q, k=5, n_centroids=16, nprobe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # nprobe=6/16 partitions scanned


def test_ivf_nprobe_all_is_exact(spark):
    from lazyosm_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, q, k=5).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_ann_topk(emb, q, k=5, n_centroids=8, nprobe=8).collect()
    }
    assert full == exact  # probing every partition == brute force


def test_lsh_ann_recall(spark):
    from lazyosm_spark.operators.similarity import cosine_topk, lsh_ann_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 25)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, q, k=3, n_planes=12, bands=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_embedding_near_dup_lsh_subset_of_exact(spark):
    from lazyosm_spark.operators.similarity import (
        cosine_near_dup_exact,
        embedding_near_dup_pairs,
    )

    emb = _emb(spark)
    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_near_dup_exact(emb, 0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, 0.35).collect()
    }
    assert lsh <= exact  # no false positives (exact verify step)
    if exact:
        assert len(lsh) / len(exact) >= 0.2  # candidate recall floor


def test_minhash_lsh_recall_vs_exact(spark):
    from lazyosm_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.12).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.12).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))
