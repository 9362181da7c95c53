"""PBF wire-format round-trip: world -> .osm.pbf shards -> distributed
scan -> decoded entities == world; features identical to the parquet
fixture path."""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lazyosm_spark.sources import pbf


def test_varint_vectorized_roundtrip():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.integers(0, 127, 50),
            rng.integers(0, 2**32, 50),
            rng.integers(0, 2**62, 20),
            [0, 1, 127, 128, 2**62],
        ]
    ).astype(np.int64)
    buf = pbf.encode_varints(vals)
    out = pbf.decode_varints_np(buf)
    assert out.tolist() == vals.tolist()

    svals = np.concatenate([vals, -vals]).astype(np.int64)
    sbuf = pbf.encode_svarints(svals)
    sout = pbf.decode_svarints_np(sbuf)
    assert sout.tolist() == svals.tolist()


def test_pbf_roundtrip_matches_world(spark):
    from lazyosm_spark.operators.osm import (
        decode_nodes,
        decode_relations,
        decode_ways,
    )
    from lazyosm_spark.sources.fixtures import build_world

    world = build_world("tiny")
    with tempfile.TemporaryDirectory() as d:
        # shard nodes across 3 files (block-parallel scan layout)
        n = world["nodes"]
        thirds = np.array_split(np.argsort(n["id"].to_numpy()), 3)
        for si, idxs in enumerate(thirds):
            pbf.write_pbf_shard(
                os.path.join(d, f"nodes_{si}.osm.pbf"),
                nodes=n.iloc[idxs],
                block_size=50,
            )
        pbf.write_pbf_shard(
            os.path.join(d, "ways.osm.pbf"), ways=world["ways"], block_size=10
        )
        pbf.write_pbf_shard(
            os.path.join(d, "rels.osm.pbf"), relations=world["relations"]
        )
        assert len(glob.glob(os.path.join(d, "*.pbf"))) == 5

        enc = pbf.read_pbf(spark, os.path.join(d, "*.osm.pbf"))
        nodes = decode_nodes(enc["nodes_encoded"])
        ways = decode_ways(enc["ways_encoded"])
        rels = decode_relations(enc["relations_encoded"])

        wn = spark.createDataFrame(
            world["nodes"][["id", "lon", "lat"]]
        )
        assert nodes.count() == len(world["nodes"])
        assert nodes.select("id", "lon", "lat").exceptAll(wn).count() == 0

        # tags round-trip (json-normalized compare)
        got_tags = {
            r["id"]: dict(r["tags"]) for r in nodes.select("id", "tags").collect()
        }
        for _, row in world["nodes"].iterrows():
            assert got_tags[row["id"]] == dict(row["tags"]), row["id"]

        got_ways = {r["id"]: list(r["refs"]) for r in ways.collect()}
        for _, row in world["ways"].iterrows():
            assert got_ways[row["id"]] == list(row["refs"])

        got_rels = {
            r["id"]: (list(r["memids"]), list(r["roles"]), dict(r["tags"]))
            for r in rels.collect()
        }
        for _, row in world["relations"].iterrows():
            assert got_rels[row["id"]] == (
                list(row["memids"]),
                list(row["roles"]),
                dict(row["tags"]),
            )


def test_pbf_tagless_block_flag(spark):
    from lazyosm_spark.sources.fixtures import build_world

    world = build_world("tiny")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "n.osm.pbf")
        pbf.write_pbf_shard(path, nodes=world["nodes"], block_size=50)
        enc = pbf.read_pbf(spark, path)
        blocks = enc["nodes_encoded"].select("has_tags", "min_id", "max_id").collect()
        # the fixture world contains fully-untagged id runs -> some
        # blocks must carry has_tags=False (TagsBool zone-map analog)
        flags = [r["has_tags"] for r in blocks]
        assert any(flags) and not all(flags)
        # zone maps are disjoint and ordered within the sorted shard
        spans = sorted((r["min_id"], r["max_id"]) for r in blocks)
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 < a2
