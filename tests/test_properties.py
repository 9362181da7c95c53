"""Property-based tests (hypothesis): kernel-level invariants that
seeded examples can miss.  Pure-python/numpy kernels only — no Spark
session needed, so these run fast under hypothesis' example budget."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lazyosm_spark.functions import geometry as eng
from lazyosm_spark.sources import pbf
from tests.oracle import reference_oracle as ro

longs = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=200, deadline=None)
@given(st.lists(longs, min_size=0, max_size=50))
def test_varint_zigzag_roundtrip_property(vals):
    arr = np.asarray(vals, dtype=np.int64)
    assert pbf.decode_svarints_np(pbf.encode_svarints(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-10, 10, allow_nan=False, width=32),
            st.floats(-10, 10, allow_nan=False, width=32),
        ),
        min_size=3,
        max_size=10,
        unique=True,
    ),
    st.tuples(
        st.floats(-12, 12, allow_nan=False, width=32),
        st.floats(-12, 12, allow_nan=False, width=32),
    ),
)
def test_pip_matches_scalar_oracle_property(poly, pt):
    poly_t = [(float(x), float(y)) for x, y in poly]
    p = (float(pt[0]), float(pt[1]))
    got = bool(eng.pip_mask(np.asarray(poly_t), np.asarray([p]))[0])
    assert got == ro.pip(poly_t, p)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=4, max_value=24),
    st.integers(min_value=1, max_value=6),
    st.randoms(use_true_random=False),
)
def test_connect_reassembles_property(n, k, rnd):
    """Any ring split into <=k ways, shuffled + reversed, reconnects to
    one closed ring over the same node set — and engine == oracle."""
    k = min(k, n - 1)
    ids = list(range(1, n + 1))
    cyc = ids + [ids[0]]
    cuts = sorted(rnd.sample(range(1, n), k - 1)) if k > 1 else []
    bounds = [0, *cuts, n]
    ways = [cyc[s : e + 1] for s, e in zip(bounds[:-1], bounds[1:])]
    rnd.shuffle(ways)
    members = [w[::-1] if rnd.random() < 0.5 else w for w in ways]
    got = eng.connect_rings(members)
    assert got == ro.connect(members)
    assert len(got) == 1
    assert got[0][0] == got[0][-1]
    assert set(got[0]) == set(ids)


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e6, 1e6, allow_nan=False))
def test_round_ref_matches_oracle_property(x):
    from lazyosm_spark.functions.geometry import round_ref_np

    got = float(round_ref_np(np.asarray([x]))[0])
    assert got == ro.round_ref(x)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=192, max_size=192))
def test_codec_lossless_roundtrip_property(flat):
    from lazyosm_spark.sources.images import decode_image, encode_image

    px = np.asarray(flat, dtype=np.uint8).reshape(8, 8, 3)
    for fmt in ("raw", "ppm"):
        assert np.array_equal(decode_image(encode_image(px, fmt), fmt, 8, 8), px)
