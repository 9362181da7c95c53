"""Shared marker-bounded markdown splicing for the BENCH scripts.

One implementation of the BEGIN/END auto:* block replacement (round-4
ADVICE: heading-substring splicing silently truncated or duplicated
manually maintained evidence; three hand-rolled copies then started to
diverge).  All failure modes are loud: unpaired markers always abort,
and a missing pair aborts unless the caller opts into `append` (block
lands at EOF) or `anchor` (block lands immediately BEFORE the
manual-sections anchor comment).
"""

from __future__ import annotations

import sys

ANCHOR = "<!-- ANCHOR manual-sections -->"


def splice_marker_block(
    path: str, tag: str, body: str, *, if_missing: str = "fail"
) -> str:
    """Replace ``<!-- BEGIN tag --> ... <!-- END tag -->`` in ``path``
    with ``body`` (markers added here; pass body WITHOUT them).
    ``if_missing``: "fail" | "append" | "anchor".  Returns the block
    as written."""
    begin = f"<!-- BEGIN {tag} -->"
    end = f"<!-- END {tag} -->"
    block = begin + "\n" + body.rstrip() + "\n" + end
    with open(path) as f:
        old = f.read()
    if (begin in old) != (end in old):
        sys.exit(f"{path} has an unpaired marker pair for {tag}; fix the file before splicing")
    if begin in old:
        new = old[: old.index(begin)] + block + old[old.index(end) + len(end):]
    elif if_missing == "append":
        new = old.rstrip() + "\n\n\n" + block + "\n"
    elif if_missing == "anchor":
        if ANCHOR not in old:
            sys.exit(f"{path} lacks both {begin} and {ANCHOR}; add the anchor where the block should land")
        new = old.replace(ANCHOR, block + "\n\n" + ANCHOR, 1)
    else:
        sys.exit(f"{path} lacks {begin}; add the marker pair where the block belongs")
    with open(path, "w") as f:
        f.write(new)
    return block
