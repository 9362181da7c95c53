"""Geometry kernels vs the scalar oracle: PIP edge rules, ring connect
convergence, polygon nesting — including randomized property checks."""

from __future__ import annotations

import numpy as np

from lazyosm_spark.functions import geometry as eng
from tests.oracle import reference_oracle as ro

SQ = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_pip_boundary_rules():
    pts = [
        (2, 2),      # interior
        (5, 5),      # outside
        (0, 2),      # left edge  -> inside (x <= xint on vertical edge)
        (4, 2),      # right edge -> outside (p.x >= max edge x)
        (2, 0),      # bottom edge -> outside (p.y <= bottom)
        (2, 4),      # top edge    -> outside (p.y >= top)
        (0, 0),      # corner      -> outside
        (3.999999, 2),  # just inside right
        (1e-9, 2),      # just inside left
    ]
    got = eng.pip_mask(np.array(SQ), np.array(pts, dtype=float))
    want = [ro.pip(SQ, p) for p in pts]
    assert got.tolist() == want
    assert want == [True, False, True, False, False, False, False, True, True]


def test_pip_random_polygons_match_oracle():
    rng = np.random.default_rng(7)
    for trial in range(20):
        k = int(rng.integers(3, 12))
        angs = np.sort(rng.uniform(0, 2 * np.pi, k))
        poly = np.column_stack(
            [np.cos(angs) * rng.uniform(0.5, 2.0, k), np.sin(angs) * rng.uniform(0.5, 2.0, k)]
        )
        pts = rng.uniform(-2.5, 2.5, size=(200, 2))
        got = eng.pip_mask(poly, pts)
        want = [ro.pip([tuple(v) for v in poly], tuple(p)) for p in pts]
        assert got.tolist() == want, f"trial {trial}"


def _ring(n, seed):
    rng = np.random.default_rng(seed)
    ids = list(range(100 * seed + 1, 100 * seed + 1 + n))
    return ids


def test_connect_reassembles_scrambled_rings():
    """Property: a ring split into k ways, randomly ordered + reversed,
    reconnects to one closed ring covering the same node set."""
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(6, 20))
        ids = _ring(n, trial + 1)
        cyc = ids + [ids[0]]
        k = int(rng.integers(2, min(6, n)))
        cuts = sorted(rng.choice(np.arange(1, n), size=k - 1, replace=False))
        bounds = [0, *cuts, n]
        ways = [cyc[s : e + 1] for s, e in zip(bounds[:-1], bounds[1:])]
        order = rng.permutation(k)
        members = []
        for j in order:
            w = ways[j]
            members.append(w[::-1] if rng.random() < 0.5 else w)
        got = eng.connect_rings(members)
        want = ro.connect(members)
        assert got == want, f"trial {trial}"
        assert len(got) == 1
        ring = got[0]
        assert ring[0] == ring[-1]
        assert set(ring) == set(ids)


def test_connect_multiple_rings_and_closed_passthrough():
    closed = [1, 2, 3, 1]
    open_a = [10, 11, 12]
    open_b = [12, 13, 10]
    got = eng.connect_rings([closed, open_a, open_b])
    assert ro.connect([closed, open_a, open_b]) == got
    assert closed in got
    others = [r for r in got if r != closed]
    assert len(others) == 1 and others[0][0] == others[0][-1]


def test_connect_degenerate_bounded():
    """Unclosable chains must terminate (generation bound) and emit
    best-effort output."""
    members = [[1, 2], [3, 4], [5, 6], [7, 8]]
    got = eng.connect_rings(members)
    assert got == ro.connect(members)
    assert sum(len(r) for r in got) >= 4


def test_assemble_nesting_first_outer_wins():
    outer1 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    outer2 = [(20, 0), (30, 0), (30, 10), (20, 10), (20, 0)]
    hole1 = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]
    hole2 = [(22, 2), (24, 2), (24, 4), (22, 4), (22, 2)]
    polys = eng.assemble_polygons(
        [np.array(outer1, float), np.array(outer2, float)],
        [np.array(hole2, float), np.array(hole1, float)],
    )
    want = ro.assemble([outer1, outer2], [hole2, hole1])
    assert len(polys) == 2
    got_shape = [[len(r) for r in p] for p in polys]
    want_shape = [[len(r) for r in p] for p in want]
    assert got_shape == want_shape
    # hole1 belongs to outer1, hole2 to outer2
    assert polys[0][1].tolist() == [list(p) for p in hole1]
    assert polys[1][1].tolist() == [list(p) for p in hole2]
