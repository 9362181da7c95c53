"""Independent scalar BPE reference — the oracle twin of
lazyosm_spark/operators/tokenize.py.  NO engine imports (the rule for
everything under tests/oracle/): this file re-implements encode/decode
from the committed merges JSON with the CLASSIC formulation — apply
each merge over the symbol sequence in training-rank order — whereas
the engine encodes by repeatedly contracting the lowest-rank adjacent
pair.  The two formulations are provably equivalent for BPE-trained
merge tables; the tests assert their outputs identical token-by-token.

Vocabulary file format (produced by tools/train_bpe.py):
    {"version": 1, "normalizer": "lower_trim_collapse_ws",
     "tokens": ["<unk>", ...base chars..., END_WORD, ...merge outputs...],
     "merges": [["t", "h"], ["th", "e▁"], ...]}
"""

from __future__ import annotations

import json
import re

UNK_ID = 0
END_WORD = "\u2581"  # non-ASCII: never collides with printable-ASCII input


def load_spec(path: str) -> dict:
    with open(path) as f:
        spec = json.load(f)
    assert spec["version"] == 1 and spec["tokens"][UNK_ID] == "<unk>"
    return spec


def normalize(text: str) -> str:
    """Scalar twin of operators.dedup.normalize_text (lower + trim +
    collapse whitespace) — corpus is ASCII so \\s semantics agree."""
    return re.sub(r"\s+", " ", text.strip().lower())


def encode_word(word: str, merges: list[list[str]], tok2id: dict[str, int]) -> list[int]:
    """One pass per merge in TRAINING ORDER, contracting left-to-right —
    the textbook sequential-replacement formulation."""
    syms: list[str] = list(word) + [END_WORD]
    for a, b in merges:
        if len(syms) == 1:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return [tok2id.get(s, UNK_ID) for s in syms]


def encode(text: str, spec: dict) -> list[int]:
    tok2id = {t: i for i, t in enumerate(spec["tokens"])}
    merges = [tuple(m) for m in spec["merges"]]
    ids: list[int] = []
    norm = normalize(text)
    if not norm:
        return ids
    for word in norm.split(" "):
        ids.extend(encode_word(word, merges, tok2id))
    return ids


def decode(ids: list[int], spec: dict) -> str:
    toks = spec["tokens"]
    return "".join(toks[i] for i in ids).replace(END_WORD, " ").strip()
