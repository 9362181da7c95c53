"""Scaling-efficiency evidence: run the flagship image pipeline at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for
N vs 4N executors, BASELINE.json north_rule) on IDENTICAL input and
report throughput at both plus efficiency = (T8/T32)/4.

The input image table is built ONCE (distributed synthesis) and shared;
each measured run is a separate process (one JVM cannot host two
masters).  Writes BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(extra: list[str], timeout: int = 2400, ncpus: int | None = None) -> dict:
    # taskset pins the run to exactly N physical cores — otherwise the
    # "8-core" JVM leaks GC/shuffle/python-worker threads onto the idle
    # 24 cores and the comparison flatters the small configuration
    prefix = ["taskset", "-c", f"0-{ncpus - 1}"] if ncpus else []
    proc = subprocess.run(
        [*prefix, sys.executable, os.path.join(REPO, "jobs", "tile_images.py"), *extra],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError("job produced no JSON line")
    return json.loads(lines[-1])


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    size_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    work = tempfile.mkdtemp(prefix="scaling_")
    images = os.path.join(work, "images")
    try:
        run_job(
            ["--generate", "--images", images, "--n-images", str(n_images),
             "--img-size-mult", str(size_mult), "--cpus", "32"]
        )
        results = {}
        for cpus in (8, 32):
            out = os.path.join(work, f"out_{cpus}")
            results[cpus] = run_job(
                ["--images", images, "--output", out, "--cpus", str(cpus)],
                ncpus=cpus,
            )
        lo, hi = results[8], results[32]
        speedup = lo["seconds"] / hi["seconds"]
        eff = speedup / (32 / 8)
        md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N parallelism)

The north rule's two-cluster-size criterion, evidenced in-sandbox by
running the identical flagship pipeline (`jobs/tile_images.py`: scan
{n_images:,} stored images -> mapInPandas DECODE (inverse-DCT + phash integrity gate) -> footprint points -> shuffle-free spatial join against the
tile pyramid -> per-tile rollup, all checkpointed with per-bucket
lineage) at two parallelism levels in separate JVMs over the SAME
pre-built input table.

| parallelism | wall (s) | images/s |
|---|---|---|
| local[8]  (N)  | {lo["seconds"]} | {lo["images_per_sec"]:,} |
| local[32] (4N) | {hi["seconds"]} | {hi["images_per_sec"]:,} |

- speedup 8->32 cores: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.2f}** (target >= 0.8)
- memberships identical across runs: {lo["n_memberships"] == hi["n_memberships"]} ({hi["n_memberships"]:,} rows)
- per-row phash integrity failures: {hi["n_integrity_failures"]} (gate green)

Method notes:
- The decode stage is the dominant, embarrassingly-parallel cost — the
  realistic shape for a multimodal pipeline (codec work per image).
- The spatial join is shuffle-free (cell encode -> broadcast tile keys
  -> vectorized PIP pandas filter), so the image side is never
  re-partitioned; no skew, no AQE dependence.  See
  lazyosm_spark/operators/spatial_join.py for the shuffle variant used
  when the tile set exceeds broadcast size.
- Cluster path: the same job ships via `spark-submit --py-files` with
  `--master yarn/k8s`; local[N] threads stand in for executors.  The
  plan has no serial driver section beyond the 144-row tile collect.
"""
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md)
        print(md)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
