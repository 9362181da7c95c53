"""Scaling-efficiency evidence: run the flagship tiling job at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for
N vs 4N executors, BASELINE.json north_rule) on IDENTICAL input and
report throughput at both plus efficiency = (T8/T32)/4.

Writes BENCH/BASELINE.md.  Each run is a separate process (one JVM
cannot host two masters)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_images: int) -> dict:
    with tempfile.TemporaryDirectory() as out:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "tile_images.py"),
                "--output", out,
                "--cpus", str(cpus),
                "--n-images", str(n_images),
            ],
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = run(8, n_images)
    hi = run(32, n_images)
    speedup = lo["seconds"] / hi["seconds"]
    eff = speedup / (32 / 8)
    md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N parallelism)

The north rule's two-cluster-size criterion, evidenced in-sandbox by
running the identical flagship job (`jobs/tile_images.py`, spatial join
of {n_images:,} image footprints against the 144-tile pyramid, salted,
checkpointed with lineage) at two parallelism levels in separate JVMs.

| parallelism | wall (s) | images/s |
|---|---|---|
| local[8]  (N)  | {lo["seconds"]} | {lo["images_per_sec"]:,} |
| local[32] (4N) | {hi["seconds"]} | {hi["images_per_sec"]:,} |

- speedup 8->32 cores: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.2f}** (target >= 0.8)
- memberships produced: {hi["n_memberships"]:,} (identical both runs: {lo["n_memberships"] == hi["n_memberships"]})

Cluster path: the same job ships via `spark-submit --py-files` with
`--master yarn/k8s`; parallelism here is executor threads, on a cluster
it is `--num-executors` — the plan (hash-partitioned joins, salted
groupBys, AQE) contains no driver-side serial sections beyond the tile
pyramid collect (144 rows).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
