"""Independent scalar oracle for token-span duplicate detection.

Set-union formulation (deliberately different from the engine's
lead()-window interval merge): enumerate every L-token span as a
tuple, count occurrences corpus-wide, and take the per-doc union of
covered positions as an explicit set.  No engine imports.
"""

from __future__ import annotations

from collections import Counter


def contamination_ref(
    docs: dict[int, list[int]], eval_docs: dict[int, list[int]], span_len: int
) -> dict[int, tuple[int, int, int]]:
    """-> {doc_id: (n_tokens, n_hit_spans, hit_tokens)} — corpus spans
    present anywhere in the eval set, set-union coverage."""
    eval_spans = {
        tuple(ids[i : i + span_len])
        for ids in eval_docs.values()
        for i in range(len(ids) - span_len + 1)
    }
    out = {}
    for doc_id, ids in docs.items():
        covered: set[int] = set()
        n_hit = 0
        for i in range(len(ids) - span_len + 1):
            if tuple(ids[i : i + span_len]) in eval_spans:
                n_hit += 1
                covered.update(range(i, i + span_len))
        out[doc_id] = (len(ids), n_hit, len(covered))
    return out


def duplicate_spans_ref(
    docs: dict[int, list[int]], span_len: int, min_count: int = 2
) -> dict[int, tuple[int, int, int]]:
    """-> {doc_id: (n_tokens, n_dup_spans, dup_tokens)}."""
    counts: Counter = Counter()
    for ids in docs.values():
        for i in range(len(ids) - span_len + 1):
            counts[tuple(ids[i : i + span_len])] += 1
    out = {}
    for doc_id, ids in docs.items():
        covered: set[int] = set()
        n_dup = 0
        for i in range(len(ids) - span_len + 1):
            if counts[tuple(ids[i : i + span_len])] >= min_count:
                n_dup += 1
                covered.update(range(i, i + span_len))
        out[doc_id] = (len(ids), n_dup, len(covered))
    return out
