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
