"""Geometry kernels: vectorized ray-cast PIP, ring connect, polygon nesting.

Pure numpy/python — these run INSIDE pandas UDFs / applyInPandas batches
(never per-row Python at the Spark layer).  Semantics follow the
reference (file:line cites into /root/reference/) with deterministic
resolutions of its undefined behaviors, documented per function.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Ray-cast point-in-polygon — reference Pip, relation_handler.go:43-81.
# Edge rules reproduced exactly:
#   * bottom vertex inclusive / top vertex exclusive:
#       skip edge when p.y <= min(y) or p.y >= max(y)
#   * skip when p.x >= max(edge xs) or the edge is horizontal
#   * crossing iff the edge is non-vertical and p.x <= x-intersection
#     (vertical edges that survived the bbox tests always cross)
# ---------------------------------------------------------------------------


def pip_mask(poly: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test.

    poly: (M, 2) ring vertices (closing edge last->first is implicit,
          matching the reference's index wraparound at
          relation_handler.go:48-51).
    pts:  (N, 2) query points.
    returns (N,) bool — inside mask.
    """
    poly = np.asarray(poly, dtype=np.float64)
    pts = np.asarray(pts, dtype=np.float64)
    if len(poly) < 3 or len(pts) == 0:
        return np.zeros(len(pts), dtype=bool)
    cx, cy = poly[:, 0], poly[:, 1]                       # (M,)
    nx, ny = np.roll(cx, -1), np.roll(cy, -1)             # next vertex
    px = pts[:, 0][:, None]                               # (N,1)
    py = pts[:, 1][:, None]

    bottom = np.minimum(cy, ny)                           # (M,)
    top = np.maximum(cy, ny)
    in_band = (py > bottom) & (py < top)                  # (N,M)
    not_right = px < np.maximum(cx, nx)
    non_horiz = ny != cy

    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (py - cy) * (nx - cx) / (ny - cy) + cx     # (N,M)
    # reference: skip if edge non-vertical AND p.x > xint
    crosses = np.where(cx != nx, px <= xint, True)

    hits = in_band & not_right & non_horiz & crosses
    return (hits.sum(axis=1) % 2).astype(bool)


def ring_within(outer: np.ndarray, inner: np.ndarray) -> bool:
    """inner ⊂ outer iff ALL inner vertices pass Pip(outer)
    (reference Within, relation_handler.go:84-93; note the call sites
    swap arg names — Poly(outer).Within(Poly(inner)) tests inner's
    points against outer, relation_handler.go:466, ring_logic.go:323)."""
    return bool(pip_mask(outer, inner).all())


# ---------------------------------------------------------------------------
# Ring connect — reference Connect, ring_logic.go:101-256.
#
# Semantics kept: chains merge by the 4 endpoint-match cases of Collision
# (ring_logic.go:45-72), junction nodes are DUPLICATED on concat (the
# reference appends whole slices; cleanse is never called,
# ring_logic.go:209-211), scan order is keys sorted DESCENDING
# (SortedMap, ring_logic.go:79-88), iteration is bounded at 100
# generations (ring_logic.go:115,162), and if exactly two open chains
# remain they are merged unconditionally (final cleanup,
# ring_logic.go:226-247).
#
# Deterministic resolutions of reference UB (documented deviations):
#   1. A chain that becomes closed (first==last) is finalized
#      immediately — the reference leaves it in the map where the
#      2-member final merge could splice two already-closed rings
#      together (Go map iteration order makes that nondeterministic).
#   2. First match in descending-key order wins — the reference keeps a
#      stale slice + stale lastpt across multiple matches
#      (ring_logic.go:121,134), whose aliasing behavior is
#      Go-runtime-defined.
#   3. The final 2-chain merge takes the smaller key as the base chain.
# ---------------------------------------------------------------------------


def _try_merge(a: list, b: list):
    """Connect's endpoint cases, collapsed to one continuous-chain merge.

    Pass 1 appends on tail(a)==head(b) (ring_logic.go:128-150); pass 2
    additionally reverses the partner on head-head / tail-tail matches
    so a later scan can append (ring_logic.go:185-206).  We fuse
    reverse+append into one step; the junction node is duplicated, as
    the reference's whole-slice appends do (cleanse never called,
    ring_logic.go:209-211)."""
    if a[-1] == b[0]:
        return a + b
    if a[0] == b[-1]:
        return b + a
    if a[0] == b[0]:
        return b[::-1] + a
    if a[-1] == b[-1]:
        return a + b[::-1]
    return None


def connect_rings(members: list[list]) -> list[list]:
    """Open polylines (node-id or coord-tuple lists) -> closed rings."""
    rings: list[list] = []
    chains: dict[int, list] = {}
    for pos, m in enumerate(members):
        if len(m) == 0:
            continue
        if len(m) > 1 and m[0] == m[-1]:
            rings.append(list(m))  # already closed (Satisfy, ring_logic.go:74-77)
        else:
            chains[pos] = list(m)

    generation = 0
    while chains and generation < 100:
        generation += 1
        merged_any = False
        for k in sorted(chains, reverse=True):
            if k not in chains:
                continue
            member = chains[k]
            for ktry in sorted(chains, reverse=True):
                if ktry == k or ktry not in chains:
                    continue
                merged = _try_merge(member, chains[ktry])
                if merged is not None:
                    del chains[ktry]
                    if len(merged) > 1 and merged[0] == merged[-1]:
                        rings.append(merged)
                        del chains[k]
                    else:
                        chains[k] = merged
                    merged_any = True
                    break
        if not merged_any:
            break

    # final cleanup: exactly two leftover open chains merge
    # unconditionally (ring_logic.go:226-247)
    if len(chains) == 2:
        ks = sorted(chains)
        a, b = chains[ks[0]], chains[ks[1]]
        merged = a + b if a[-1] == b[0] else a + b[::-1]
        chains = {ks[0]: merged}
    rings.extend(chains[k] for k in sorted(chains))
    return rings


# ---------------------------------------------------------------------------
# Polygon assembly — reference MakePolygon / ProcessRelationBlock
# (ring_logic.go:308-340, relation_handler.go:460-488): each inner ring
# is assigned to the FIRST outer that contains it, then removed.
# Deterministic deviation: outers are visited in connect output order,
# inners in ascending ring index (the reference iterates a Go map,
# relation_handler.go:465-471 — unordered).
# ---------------------------------------------------------------------------


def assemble_polygons(
    outers: list[np.ndarray], inners: list[np.ndarray]
) -> list[list[np.ndarray]]:
    """[outer rings], [inner rings] -> list of polygons, each
    [outer, inner, inner, ...].  Caller decides Polygon vs MultiPolygon
    by len()==1 (relation_handler.go:474-488)."""
    remaining = dict(enumerate(inners))
    polygons = []
    for outer in outers:
        rings = [outer]
        for idx in sorted(remaining):
            if ring_within(outer, remaining[idx]):
                rings.append(remaining[idx])
                del remaining[idx]
        polygons.append(rings)
    return polygons


def round_ref_np(a: np.ndarray, places: int = 6) -> np.ndarray:
    """Numpy twin of decode.round_ref (reference Round,
    relation_handler.go:25-37): positives half-up, negatives floor
    (Go Modf fractional part carries the sign)."""
    pow_ = 10.0**places
    digit = a * pow_
    frac = digit - np.trunc(digit)
    return np.where(frac >= 0.5, np.ceil(digit), np.floor(digit)) / pow_
