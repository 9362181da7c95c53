"""End-to-end resume: the flagship job run twice against the same
output directory is idempotent (bucket-level skip), and a partial run
followed by a full run converges to the single-run result."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "tile_images.py"), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-3000:]
    return json.loads(lines[-1])


def test_job_rerun_is_idempotent(spark):
    with tempfile.TemporaryDirectory() as d:
        images = os.path.join(d, "imgs")
        out = os.path.join(d, "out")
        _run(["--generate", "--images", images, "--n-images", "3000", "--cpus", "8"])
        r1 = _run(["--images", images, "--output", out, "--cpus", "8", "--buckets", "8"])
        r2 = _run(["--images", images, "--output", out, "--cpus", "8", "--buckets", "8"])
        assert r1["n_memberships"] == r2["n_memberships"]
        assert r1["n_integrity_failures"] == r2["n_integrity_failures"] == 0
        # second run wrote nothing new: per-stage lineage bucket sets and
        # row counts unchanged, and data has no duplicate image ids
        feats = spark.read.parquet(os.path.join(out, "data", "decode_features"))
        assert feats.count() == 3000
        assert feats.select("image_id").distinct().count() == 3000
        snaps = [
            json.loads(l)
            for l in open(os.path.join(out, "_snapshots.jsonl"))
        ]
        # exactly one commit per stage (the rerun skipped all buckets)
        per_stage = {}
        for s in snaps:
            per_stage[s["stage"]] = per_stage.get(s["stage"], 0) + 1
        assert all(v == 1 for v in per_stage.values()), per_stage


def test_corpus_make_pipeline_and_resume(spark, tmp_path):
    """jobs/corpus_make.py end-to-end: curate -> tokenize -> pack with
    lineage checkpoints; a re-run resumes (no duplicated buckets, same
    outputs, verify_stage green on every stage)."""
    from jobs.corpus_make import run_pipeline
    from lazyosm_spark.plans.lineage import CheckpointedPipeline

    out_dir = str(tmp_path / "corpus")
    docs = "/root/testdata/sf0.001/documents.parquet"
    r1 = run_pipeline(spark, docs, out_dir, ctx_len=128)
    assert r1["docs_in"] == 500 and 0 < r1["docs_kept"] <= 500
    assert r1["total_tokens"] > 0 and r1["n_sequences"] > 0
    # tokens stage consistency: sum(n_tokens) == last packed boundary
    assert (r1["total_tokens"] - 1) // 128 + 1 == r1["n_sequences"]

    pipe = CheckpointedPipeline(spark, out_dir)
    for stage in ("curate", "tokens", "pack"):
        assert pipe.verify_stage(stage), stage

    # resume: identical results, no duplicate rows appended
    r2 = run_pipeline(spark, docs, out_dir, ctx_len=128)
    assert (
        r2["docs_kept"] == r1["docs_kept"]
        and r2["total_tokens"] == r1["total_tokens"]
        and r2["n_sequences"] == r1["n_sequences"]
    )
    for stage in ("curate", "tokens", "pack"):
        assert pipe.verify_stage(stage), stage
    # redaction actually flowed through: the tokenized text was the
    # CLEAN text (no PII pattern can survive into the kept docs)
    from pyspark.sql import functions as F

    curated = spark.read.parquet(f"{out_dir}/data/curate")
    from lazyosm_spark.operators.text import pii_scrub

    rescrub = pii_scrub(
        curated.select("doc_id", F.col("clean_text").alias("text"))
    )
    assert rescrub.agg(F.sum("n_pii")).first()[0] == 0
