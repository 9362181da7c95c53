"""Streaming surface: micro-batch tiling equals the batch operator;
windowed rollup matches its batch twin."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_stream_tile_points_equals_batch(spark, fx):
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.streaming.pipeline import stream_tile_points

    pts = spark.createDataFrame(
        [(f"p{i}",
          -180.0 + 360.0 * ((i * 0.7548776662466927) % 1.0),
          -85.0 + 170.0 * ((i * 0.5698402909980532) % 1.0))
         for i in range(200)],
        "point_id string, lon double, lat double",
    )
    with tempfile.TemporaryDirectory() as d:
        in_dir = os.path.join(d, "in")
        out_dir = os.path.join(d, "out")
        ck_dir = os.path.join(d, "ck")
        # two "arriving" files
        pts.filter(F.col("point_id") < "p2").write.parquet(
            os.path.join(in_dir, "batch1")
        )
        pts.filter(F.col("point_id") >= "p2").write.parquet(
            os.path.join(in_dir, "batch2")
        )
        q = stream_tile_points(
            spark,
            input_dir=in_dir + "/*",
            input_schema="point_id string, lon double, lat double",
            tiles=fx["tiles"],
            output_dir=out_dir,
            checkpoint_dir=ck_dir,
        )
        q.awaitTermination(120)

        got = {
            (r["point_id"], r["tile_id"])
            for r in spark.read.parquet(out_dir).collect()
        }
        want = {
            (r["point_id"], r["tile_id"])
            for r in tile_points(pts, fx["tiles"]).collect()
        }
        assert got == want

        # epoch REPLAY (crash after sink write, before checkpoint
        # commit): rerunning the same input with a fresh checkpoint
        # replays epoch 0 — the dynamic epoch-partition overwrite must
        # keep output exactly-once (a blind append would double it)
        n_before = spark.read.parquet(out_dir).count()
        q2 = stream_tile_points(
            spark,
            input_dir=in_dir + "/*",
            input_schema="point_id string, lon double, lat double",
            tiles=fx["tiles"],
            output_dir=out_dir,
            checkpoint_dir=os.path.join(d, "ck2"),
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == n_before


def test_windowed_counts_batch_twin(spark):
    from lazyosm_spark.streaming.pipeline import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour")
    total = out.agg(F.sum("n")).first()[0]
    assert total == ev.count()
    # window bounds align to the hour
    bad = out.filter(F.minute("win_start") != 0).count()
    assert bad == 0


def test_stream_exact_dedup_stateful(spark):
    import os
    import tempfile

    from lazyosm_spark.streaming.pipeline import stream_exact_dedup

    docs = spark.createDataFrame(
        [(i, f"text number {i % 7}") for i in range(50)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        in_dir, out_dir, ck = (os.path.join(d, x) for x in ("in", "out", "ck"))
        # two arrival waves with overlapping content
        docs.filter(F.col("doc_id") < 20).write.parquet(os.path.join(in_dir, "b1"))
        docs.filter(F.col("doc_id") >= 20).write.parquet(os.path.join(in_dir, "b2"))
        q = stream_exact_dedup(
            spark, in_dir + "/*", "doc_id long, text string", out_dir, ck
        )
        q.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        rows = out.collect()
        # exactly one survivor per distinct text (7 distinct)
        assert len(rows) == 7
        assert out.select("text_hash").distinct().count() == 7
        # each survivor is the minimum doc_id of its group in arrival order
        for r in rows:
            assert r["doc_id"] == r["doc_id"] % 7  # ids 0..6 arrived first
