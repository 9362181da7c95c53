"""spark-submit --py-files packaging check.

The north rule requires the engine to ship as a spark-submit
``--py-files`` package runnable unchanged on a cluster.  This tool
proves the claim end-to-end: it zips ``lazyosm_spark``, writes a small
driver script that imports the package and runs the flagship spatial
join on inline data, and launches it through REAL ``spark-submit``
from a neutral cwd with no PYTHONPATH — exactly how a cluster driver
would receive the code.  Exits nonzero on any failure.

Usage: python tools/package_check.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import json

from pyspark.sql import SparkSession

# NOTE: no sys.path edits, no repo cwd — lazyosm_spark must resolve
# purely from the --py-files zip
from lazyosm_spark.operators.spatial_join import tile_points

spark = (
    SparkSession.builder.appName("package_check")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
pts = spark.createDataFrame(
    [(str(i), -20.0 + i * 1.3, -10.0 + i * 0.7) for i in range(40)],
    "point_id string, lon double, lat double",
)
res, x, y = 3, 3, 3
nx = 1 << res
lon0, lat0 = x / nx * 360.0 - 180.0, y / nx * 180.0 - 90.0
dlon, dlat = 360.0 / nx, 180.0 / nx
ring = [[lon0, lat0], [lon0 + dlon, lat0], [lon0 + dlon, lat0 + dlat],
        [lon0, lat0 + dlat], [lon0, lat0]]
tiles = spark.createDataFrame(
    [((res << 58) | (x << 29) | y, res, ring)],
    "tile_id long, resolution int, ring array<array<double>>",
)
n = tile_points(pts, tiles).count()
print(json.dumps({"job": "package_check", "n_memberships": n}))
spark.stop()
"""


def main() -> None:
    with tempfile.TemporaryDirectory(prefix="pkgcheck_") as d:
        zip_path = os.path.join(d, "lazyosm_spark.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
            pkg = os.path.join(REPO, "lazyosm_spark")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
        job_path = os.path.join(d, "job.py")
        with open(job_path, "w") as f:
            f.write(JOB)
        import shutil

        spark_submit = (
            shutil.which("spark-submit")
            or os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--py-files", zip_path,
                job_path,
            ],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=d,  # neutral cwd: the repo dir must NOT be importable
            env=env,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit("package check produced no JSON line")
        out = json.loads(lines[-1])
        assert out["n_memberships"] > 0, out
        print(f"PACKAGE CHECK PASS: {out}")


if __name__ == "__main__":
    main()
