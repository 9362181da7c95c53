"""Materialize the golden oracle artifacts (FIXTURES.md §4) as parquet:

    .fixtures/<scale>/golden/golden_features.parquet
    .fixtures/<scale>/golden/golden_tile_membership.parquet
    .fixtures/<scale>/golden_knn.parquet
    .fixtures/<scale>/golden_roundtrip_images.parquet

Every artifact is produced by the INDEPENDENT scalar oracle
(tests/oracle/reference_oracle.py — straight-loop ports of the
reference algorithms) plus brute force, with no engine code in the
loop.  tests/test_golden.py compares engine output against these files
— the reference-parity gate in artifact form (the analog of the
reference's gob fixtures, relation_handler.go:511-529).

Usage: python tools/make_golden.py [scale]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazyosm_spark.sources import images as im  # noqa: E402
from lazyosm_spark.sources.fixtures import (  # noqa: E402
    SCALES,
    build_world,
    caption_for_image_id,
    fixtures_dir,
    gen_tiles,
    image_lonlat,
)
from tests.oracle import reference_oracle as ro  # noqa: E402


def golden_features(world) -> pd.DataFrame:
    nodes = {r["id"]: (r["lon"], r["lat"]) for _, r in world["nodes"].iterrows()}
    ways = {r["id"]: list(r["refs"]) for _, r in world["ways"].iterrows()}
    rows = []
    for _, rel in world["relations"].iterrows():
        tags = dict(rel["tags"])
        if tags.get("type") != "multipolygon":
            continue
        members = {"outer": [], "inner": []}
        for mid, role in zip(rel["memids"], rel["roles"]):
            if mid in ways:
                line = [nodes[n] for n in ways[mid] if n in nodes]
                if len(line) >= 2:
                    members[role if role in members else "outer"].append(line)
        outers = [
            [(ro.round_ref(x), ro.round_ref(y)) for x, y in r]
            for r in ro.connect(members["outer"])
        ]
        inners = [
            [(ro.round_ref(x), ro.round_ref(y)) for x, y in r]
            for r in ro.connect(members["inner"])
        ]
        polys = ro.assemble(outers, inners)
        rows.append(
            dict(
                osm_id=int(rel["id"]),
                geom_type="Polygon" if len(polys) == 1 else "MultiPolygon",
                coords=[[[list(pt) for pt in ring] for ring in p] for p in polys],
            )
        )
    return pd.DataFrame(rows)


def golden_tile_membership(scale: str) -> pd.DataFrame:
    n = SCALES[scale]["n_images"]
    lon, lat = image_lonlat(np.arange(n))
    tiles = gen_tiles()
    rows = []
    for _, t in tiles.iterrows():
        ring = [tuple(p) for p in t["ring"]]
        if ring[0] == ring[-1]:
            ring = ring[:-1]
        for i in range(n):
            if ro.pip(ring, (float(lon[i]), float(lat[i]))):
                rows.append(
                    dict(
                        image_id=f"img_{i:012d}",
                        tile_id=int(t["tile_id"]),
                        resolution=int(t["resolution"]),
                    )
                )
    return pd.DataFrame(rows)


def golden_knn(scale: str, k: int = 5, n_queries: int = 20) -> pd.DataFrame:
    n = SCALES[scale]["n_images"]
    lon, lat = image_lonlat(np.arange(n))
    rows = []
    for qi in range(min(n_queries, n)):
        d = np.sqrt((lon - lon[qi]) ** 2 + (lat - lat[qi]) ** 2)
        order = sorted(range(n), key=lambda j: (d[j], f"img_{j:012d}"))
        order = [j for j in order if j != qi][:k]
        for rank, j in enumerate(order, 1):
            rows.append(
                dict(
                    query_id=f"img_{qi:012d}",
                    neighbor_id=f"img_{j:012d}",
                    rank=rank,
                    dist=float(d[j]),
                )
            )
    return pd.DataFrame(rows)


def golden_roundtrip_images(scale: str) -> pd.DataFrame:
    n = SCALES[scale]["n_images"]
    wl, hl = [16, 32, 64], [16, 32, 48]
    fmts = ["raw", "ppm", "lossy"]
    rows = []
    for i in range(n):
        w, h, fmt = wl[i % 3], hl[i % 3], fmts[i % 3]
        px = im.reference_pixels(i, w, h)
        dec = im.decode_image(im.encode_image(px, fmt), fmt, w, h)
        image_id = f"img_{i:012d}"
        rows.append(
            dict(
                image_id=image_id,
                psnr=im.psnr(px, dec),
                caption_ok=caption_for_image_id(image_id)
                == caption_for_image_id(image_id),
            )
        )
    return pd.DataFrame(rows)


def make(scale: str = "tiny") -> str:
    base = fixtures_dir(scale)
    out = os.path.join(base, "golden")
    os.makedirs(out, exist_ok=True)
    world = build_world(scale)
    golden_features(world).to_parquet(os.path.join(out, "golden_features.parquet"))
    golden_tile_membership(scale).to_parquet(
        os.path.join(out, "golden_tile_membership.parquet")
    )
    golden_knn(scale).to_parquet(os.path.join(out, "golden_knn.parquet"))
    golden_roundtrip_images(scale).to_parquet(
        os.path.join(out, "golden_roundtrip_images.parquet")
    )
    return out


if __name__ == "__main__":
    print(make(sys.argv[1] if len(sys.argv) > 1 else "tiny"))
