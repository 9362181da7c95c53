"""Test-only scalar oracle: independent ports of the reference
algorithms, written as straight loops (no numpy vectorization, no
engine imports) so engine bugs can't hide in shared code.

Semantics sources (see SURVEY.md):
- Round:   /root/reference/relation_handler.go:25-41
- Pip:     /root/reference/relation_handler.go:43-81
- Within:  /root/reference/relation_handler.go:84-93
- Connect: /root/reference/ring_logic.go:101-256 (with the documented
  deterministic resolutions from lazyosm_spark/functions/geometry.py)
- delta decode: /root/reference/process.go:40-49, 131-137
"""

from __future__ import annotations

import math


def round_ref(val: float, places: int = 6) -> float:
    pow_ = 10.0**places
    digit = pow_ * val
    frac = digit - math.trunc(digit)  # Go math.Modf: frac keeps sign
    if frac >= 0.5:
        out = math.ceil(digit)
    else:
        out = math.floor(digit)
    return out / pow_


def pip(poly: list, p: tuple) -> bool:
    """Scalar crossing-number test with the reference's exact edge
    rules (bottom inclusive / top exclusive, right-edge skip)."""
    inter = 0
    n = len(poly)
    for i in range(n):
        curr = poly[i]
        nxt = poly[(i + 1) % n]
        bottom, top = (curr, nxt) if curr[1] < nxt[1] else (nxt, curr)
        if p[1] <= bottom[1] or p[1] >= top[1]:
            continue
        if p[0] >= max(curr[0], nxt[0]) or nxt[1] == curr[1]:
            continue
        xint = (p[1] - curr[1]) * (nxt[0] - curr[0]) / (nxt[1] - curr[1]) + curr[0]
        if curr[0] != nxt[0] and p[0] > xint:
            continue
        inter += 1
    return inter % 2 != 0


def within(outer: list, inner: list) -> bool:
    return all(pip(outer, p) for p in inner)


def delta_decode(deltas: list) -> list:
    out = []
    acc = 0
    for d in deltas:
        acc += d
        out.append(acc)
    return out


def connect(members: list[list]) -> list[list]:
    """Deterministic ring connect (same spec as the engine, implemented
    independently as plain loops)."""
    rings = []
    chains = {}
    for pos, m in enumerate(members):
        if len(m) == 0:
            continue
        if len(m) > 1 and m[0] == m[-1]:
            rings.append(list(m))
        else:
            chains[pos] = list(m)

    gen = 0
    while chains and gen < 100:
        gen += 1
        merged_any = False
        for k in sorted(chains, reverse=True):
            if k not in chains:
                continue
            a = chains[k]
            for kt in sorted(chains, reverse=True):
                if kt == k or kt not in chains:
                    continue
                b = chains[kt]
                if a[-1] == b[0]:
                    merged = a + b
                elif a[0] == b[-1]:
                    merged = b + a
                elif a[0] == b[0]:
                    merged = list(reversed(b)) + a
                elif a[-1] == b[-1]:
                    merged = a + list(reversed(b))
                else:
                    continue
                del chains[kt]
                if len(merged) > 1 and merged[0] == merged[-1]:
                    rings.append(merged)
                    del chains[k]
                else:
                    chains[k] = merged
                merged_any = True
                break
        if not merged_any:
            break

    if len(chains) == 2:
        ks = sorted(chains)
        a, b = chains[ks[0]], chains[ks[1]]
        merged = a + b if a[-1] == b[0] else a + list(reversed(b))
        chains = {ks[0]: merged}
    for k in sorted(chains):
        rings.append(chains[k])
    return rings


def assemble(outers: list[list], inners: list[list]) -> list[list[list]]:
    remaining = dict(enumerate(inners))
    polys = []
    for outer in outers:
        rings = [outer]
        for idx in sorted(remaining):
            if within(outer, remaining[idx]):
                rings.append(remaining[idx])
                del remaining[idx]
        polys.append(rings)
    return polys
