"""Mojibake detection + repair (the direction-classifier analog).

The reference runs an orientation classifier that detects upside-down
crops and rotates them before recognition
(tools/infer/predict_cls.py:39-122, use_angle_cls). The web-pipeline
analog of "the input is readable but systematically garbled" is
double-encoded text: UTF-8 bytes were decoded as latin-1/cp1252
somewhere upstream, so ``café`` arrives as ``cafÃ©``. Like the
reference's cls stage this is (a) a cheap classifier, (b) a corrective
transform, (c) applied only when the classifier fires, (d) opt-in
(``ExtractConfig.fix_mojibake``; default off keeps goldens frozen).

Frozen rules:
 * classifier: count of characteristic double-encoding lead chars
   (``Ã Â â Ã¢ €``-range sequences — U+00C2/U+00C3/U+00E2 followed by
   a non-ASCII or punctuation-range char); fires at ≥ 2 hits;
 * repair: re-encode cp1252-strict (falling back latin-1-strict for
   the 5 cp1252 holes), then decode utf-8-strict. Any failure → return
   the input unchanged (total function);
 * accept the repair only if it strictly reduces the suspicious-hit
   count — a legitimate ``Ã`` paragraph never degrades.
"""

from __future__ import annotations

import re

# U+00C2/U+00C3 (Â/Ã) lead a 2-byte UTF-8 sequence read as latin-1;
# U+00E2 (â) leads a 3-byte one (e.g. â€™ for RIGHT SINGLE QUOTE).
_SUSPECT = re.compile("[ÂÃ][-¿€‘’‚“”†‡ˆ‰Š‹ŒŽ•–—˜™š›œžŸ]|â[-¿€‘’‚“”]")

_FIRE_THRESHOLD = 2


def mojibake_score(s: str) -> int:
    """Number of characteristic double-encoding sequences in *s*."""
    return len(_SUSPECT.findall(s))


def _reencode(s: str) -> bytes | None:
    try:
        return s.encode("cp1252", "strict")
    except UnicodeEncodeError:
        try:
            return s.encode("latin-1", "strict")
        except UnicodeEncodeError:
            return None


def fix_mojibake(s: str) -> str:
    """Repair double-encoded text; total function (never raises,
    returns the input unless a strictly-better repair exists)."""
    if mojibake_score(s) < _FIRE_THRESHOLD:
        return s
    b = _reencode(s)
    if b is None:
        return s
    try:
        fixed = b.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return s
    return fixed if mojibake_score(fixed) < mojibake_score(s) else s
