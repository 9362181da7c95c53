"""Extra benchmarks for the optimization rounds (bench.py is FROZEN —
this file carries the per-query isolation walls + stage/job breakdowns
cited in OPTIMIZATION_r*.md; guide §1.4 noop-sink methodology).

Usage:
  python bench_extra.py grid_knn [sf_dir]     # per-job breakdown of one call
  python bench_extra.py suite   [sf_dir]      # noop-isolated walls per headline query
  python bench_extra.py jobs    [sf_dir] NAME # job/stage dump for one query

Each timed query runs on an exclusive box (CLAUDE.md rule).  The JSON
this prints is for OPTIMIZATION_r06.md evidence only; the driver's
number comes from the frozen bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _get_spark():
    from lazyosm_spark import get_spark

    return get_spark(
        app="bench_extra",
        cpus=CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "3000",
            "spark.ui.retainedStages": "3000",
        },
    )


def _rest(spark, path):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}", timeout=20) as r:
        return json.load(r)


def dump_jobs(spark, since_job: int, label: str) -> None:
    """Per-job wall + per-stage executor time since the marker job id."""
    jobs = [j for j in _rest(spark, "jobs") if j["jobId"] > since_job]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"--- {label}: {len(jobs)} jobs ---")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    stages = {s["stageId"]: s for s in _rest(spark, "stages?status=complete")}
    for j in jobs:
        wall = (ts(j["completionTime"]) - ts(j["submissionTime"])) if "completionTime" in j else -1
        desc = (j.get("description") or j.get("name", ""))[:90]
        print(f"job {j['jobId']:4d}  wall {wall:7.2f}s  {desc}")
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if s is None:
                continue
            print(
                f"    stage {sid:4d} tasks={s['numCompleteTasks']:4d} "
                f"execRun={s.get('executorRunTime', 0) / 1000:8.2f}s "
                f"cpu={s.get('executorCpuTime', 0) / 1e9:8.2f}s "
                f"gc={s.get('jvmGcTime', 0) / 1000:6.2f}s "
                f"shufR={s.get('shuffleReadBytes', 0) / 1e6:8.1f}MB "
                f"shufW={s.get('shuffleWriteBytes', 0) / 1e6:8.1f}MB  {s['name'][:60]}"
            )
            if s.get("executorRunTime", 0) > 5000:
                try:
                    q = _rest(
                        spark,
                        f"stages/{sid}/{s.get('attemptId', 0)}/taskSummary?"
                        "quantiles=0.0,0.5,0.95,1.0",
                    )
                    rt = [round(v / 1000, 2) for v in q["executorRunTime"]]
                    sched = [round(v / 1000, 2) for v in q.get("schedulerDelay", [0])]
                    des = [round(v / 1000, 2) for v in q.get("executorDeserializeTime", [0])]
                    print(f"      taskRun q0/50/95/100={rt} schedDelay={sched} deser={des}")
                except Exception as e:
                    print(f"      taskSummary failed: {e}")


def _last_job(spark) -> int:
    jobs = _rest(spark, "jobs")
    return max((j["jobId"] for j in jobs), default=-1)


def run_grid_knn(spark, sf_dir: str, repeats: int = 2) -> None:
    import bench
    from lazyosm_spark.operators.knn import grid_knn

    pts = bench.lineitem_points(spark, sf_dir)
    n_points = pts.count()
    panel = bench.knn_panel(spark, sf_dir)
    n_q = panel.count()
    print(f"n_points={n_points} n_queries={n_q}")
    for rep in range(repeats):
        marker = _last_job(spark)
        t0 = time.time()
        n = grid_knn(panel, pts, k=5, n_points=n_points, n_queries=n_q).count()
        wall = time.time() - t0
        print(f"grid_knn rep{rep}: {wall:.2f}s rows={n}")
        dump_jobs(spark, marker, f"grid_knn rep{rep}")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, sf_dir: str, reps: int = 3, jobs_for: str | None = None) -> None:
    """Noop-sink walls for each headline query (median of reps)."""
    import statistics

    import bench
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans import driver_queries as dq
    from lazyosm_spark.sources.fixtures import gen_tiles

    pts = bench.lineitem_points(spark, sf_dir)
    n_points = pts.count()
    panel = bench.knn_panel(spark, sf_dir)
    n_q = panel.count()
    tiles = spark.createDataFrame(gen_tiles())
    n_tiles = tiles.count()

    targets = {
        "spatial_join": lambda: tile_points(pts, tiles, salt=4, n_tiles=n_tiles),
        "tpch1_pricing": lambda: dq.QUERIES["tpch1_pricing"](spark, sf_dir),
        "way_node_assembly": lambda: dq.QUERIES["way_node_assembly"](spark, sf_dir),
        "cumsum_window": lambda: dq.QUERIES["cumsum_window"](spark, sf_dir),
        "grid_knn": lambda: grid_knn(panel, pts, k=5, n_points=n_points, n_queries=n_q),
        "minhash_lsh": lambda: dq.FIXTURE_QUERIES["fx_minhash_lsh_pairs"](spark, sf_dir),
        "cosine_topk": lambda: dq.QUERIES["cosine_topk"](spark, sf_dir),
    }
    if jobs_for:
        targets = {jobs_for: targets[jobs_for]}
    out = {}
    for name, fn in targets.items():
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for rep in range(reps):
            marker = _last_job(spark) if jobs_for else None
            t0 = time.time()
            _noop(fn())
            walls.append(round(time.time() - t0, 2))
            if jobs_for:
                dump_jobs(spark, marker, f"{name} rep{rep}")
        out[name] = {"walls": walls, "median": round(statistics.median(walls), 3)}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": os.path.basename(sf_dir.rstrip('/')), "queries": out}))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
    spark = _get_spark()
    if mode == "grid_knn":
        run_grid_knn(spark, sf_dir)
    elif mode == "jobs":
        run_suite(spark, sf_dir, reps=2, jobs_for=sys.argv[3])
    else:
        run_suite(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
