"""Independent scalar oracle for repetition_stats.

Counter-based formulation with an explicit covered-position set (no
interval arithmetic, no engine imports) mirroring the pinned
Gopher/C4-style definitions.
"""

from __future__ import annotations

import re
from collections import Counter


def repetition_stats_ref(text: str, ngram_n: int = 3) -> dict:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    words = norm.split(" ") if norm else []
    lines = [l.strip() for l in text.split("\n") if l.strip()]

    line_counts = Counter(lines)
    n_lines = len(lines)
    dup_l = sum(1 for l in lines if line_counts[l] >= 2)
    chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) for l in lines if line_counts[l] >= 2)

    bigrams = [f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)]
    big_counts = Counter(bigrams)
    max_c = max(big_counts.values()) if big_counts else 0

    n = ngram_n
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    gram_counts = Counter(grams)
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if gram_counts[g] >= 2:
            covered.update(range(i, i + n))

    nw = len(words)
    return {
        "n_words": nw,
        "n_lines": n_lines,
        "dup_line_frac": dup_l / n_lines if n_lines else 0.0,
        "dup_line_char_frac": dup_chars / chars if chars else 0.0,
        "top_bigram_frac": max_c / (nw - 1) if nw >= 2 else 0.0,
        "dup_ngram_word_frac": len(covered) / nw if nw else 0.0,
    }
