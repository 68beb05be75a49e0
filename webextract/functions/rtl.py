"""RTL segment reversal (the arabic rec-postprocess analog).

Mirrors the reference's ``pred_reverse`` semantics exactly
(ppocr/postprocess/rec_postprocess.py:51-65, enabled when the model's
charset is arabic at :42-43): the string splits into segments — every
char OUTSIDE the class ``[a-zA-Z0-9 :*./%+-]`` is its own segment,
consecutive chars INSIDE the class group into one segment — and the
segment order is reversed. Latin/digit runs keep their internal
left-to-right order; everything else (RTL script) reverses.

Off by default (``ExtractConfig.rtl_reverse``): the frozen goldens are
passthrough, matching the reference's default non-arabic models. A
reversal is applied per block at tokenize output, so block lengths,
spans and the span-slice invariant all survive (reversal is a
length-preserving permutation within each block).
"""

from __future__ import annotations

import re

_KEEP_ORDER = re.compile(r"[a-zA-Z0-9 :*./%+-]")


def rtl_segment_reverse(text: str) -> str:
    """Reverse segment order per the reference algorithm (see module
    docstring). Total function; "" → ""."""
    segs: list[str] = []
    cur = ""
    for c in text:
        if not _KEEP_ORDER.search(c):
            if cur:
                segs.append(cur)
            segs.append(c)
            cur = ""
        else:
            cur += c
    if cur:
        segs.append(cur)
    return "".join(segs[::-1])
