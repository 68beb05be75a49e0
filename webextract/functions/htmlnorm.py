"""Charset sniffing + canonical decode of raw html bytes.

The analog of the reference's byte→ndarray decode step:
``img_decode`` (paddleocr.py:425-427) and ``DecodeImage``
(ppocr/data/imaug/operators.py:30-68). Determinism rules are FROZEN —
they define byte-identity of the extracted text (SURVEY.md §7).

Frozen decode rules, applied in order:
 1. UTF-8 BOM present → strip BOM, decode utf-8 (errors → U+FFFD).
 2. Bytes decode as strict utf-8 → utf-8.
 3. A ``<meta charset=...>`` / ``content=...charset=...`` declaration in
    the first 2048 bytes names a Python-known codec → that codec
    (errors → U+FFFD).
 4. Fallback: latin-1 (total function — never raises).
"""

from __future__ import annotations

import codecs
import re

_BOM = codecs.BOM_UTF8
# matches <meta charset="utf-8"> and <meta http-equiv=... content="text/html; charset=iso-8859-1">
_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]{2,32})""",
    re.IGNORECASE,
)


def sniff_charset(raw: bytes) -> str:
    """Return the frozen charset decision for *raw* (name only)."""
    if raw.startswith(_BOM):
        return "utf-8-bom"
    try:
        raw.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET.search(raw[:2048])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return "latin-1"


def decode_html(raw: bytes) -> str:
    """bytes → canonical unicode text (total; never raises)."""
    cs = sniff_charset(raw)
    if cs == "utf-8-bom":
        return raw[len(_BOM):].decode("utf-8", "replace")
    if cs == "utf-8":
        # "replace", not "strict": sniff may return utf-8 from a META
        # declaration whose bytes aren't actually valid utf-8
        return raw.decode("utf-8", "replace")
    return raw.decode(cs, "replace")
