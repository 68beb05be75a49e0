"""Minimal-but-real PDF writer/parser (pure stdlib: zlib only).

The reference pipeline accepts PDFs next to images and fans them out to
per-page content (``check_and_read``, ppocr/utils/utility.py:102-120,
where a PDF renders to a list of page images; the GIF/PDF dispatch in
``ppocr/data/imaug/operators.py:57-65``). This module is the webtext
analog: real PDF *files* — header, numbered objects, cross-reference
table, trailer, optionally FlateDecode-compressed content streams —
written by :func:`encode_pdf` and read back by :func:`parse_pdf`, which
walks ``startxref`` → xref → trailer ``/Root`` → catalog → page tree
``/Kids`` → per-page ``/Contents`` stream, inflates ``/FlateDecode``
filters with zlib, and tokenizes the text operators (``BT``/``ET``,
``Tf``, ``Td``/``TD``/``Tm``/``TL``/``T*``, ``Tj``/``'``/``TJ``) into
positioned text fragments.

No third-party PDF library is used or available; the subset implemented
is the ISO 32000-1 text-showing core that a crawl-extraction pipeline
needs, and every structural element the writer emits (offsets, stream
lengths, escapes) is byte-checked by the parser, so round-trip tests
pin both sides.
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "encode_pdf",
    "parse_pdf",
    "reading_order",
    "column_layout_order",
    "PdfError",
]


class PdfError(ValueError):
    """Raised on any structural violation (bad xref, missing object,
    unbalanced string, unknown filter). The operators catch this and
    emit ``ok=false`` rows rather than failing the job."""


# --------------------------------------------------------------- writer

_ESCAPES = {
    b"\\": b"\\\\",
    b"(": b"\\(",
    b")": b"\\)",
    b"\n": b"\\n",
    b"\r": b"\\r",
    b"\t": b"\\t",
    b"\b": b"\\b",
    b"\f": b"\\f",
}


def _escape_string(s: str) -> bytes:
    """PDF literal-string escaping (ISO 32000-1 §7.3.4.2). Non-Latin-1
    text is out of scope for the single-byte /Helvetica subset."""
    out = bytearray()
    for ch in s.encode("latin-1"):
        b = bytes([ch])
        if b in _ESCAPES:
            out += _ESCAPES[b]
        elif ch < 0x20 or ch > 0x7E:
            out += b"\\%03o" % ch
        else:
            out += b
    return bytes(out)


def _fmt_num(v: float) -> bytes:
    if isinstance(v, int) or float(v).is_integer():
        return b"%d" % int(v)
    return (f"{v:.4f}").rstrip("0").rstrip(".").encode("ascii")


def _content_stream(frags) -> bytes:
    """Fragments ``(x, y, text)`` or ``(x, y, text, tj_split)`` → one
    text object per fragment. ``tj_split=k`` emits the fragment as a
    ``TJ`` array split at character ``k`` with a kerning adjustment
    between the halves (text content is unchanged — kerning numbers
    move glyphs, not characters)."""
    parts = []
    for frag in frags:
        x, y, text = frag[0], frag[1], frag[2]
        split = frag[3] if len(frag) > 3 else None
        pos = b"%s %s Td" % (_fmt_num(x), _fmt_num(y))
        if split is not None and 0 < split < len(text):
            shown = b"[(%s) -120 (%s)] TJ" % (
                _escape_string(text[:split]),
                _escape_string(text[split:]),
            )
        else:
            shown = b"(%s) Tj" % _escape_string(text)
        parts.append(b"BT /F1 12 Tf %s %s ET" % (pos, shown))
    return b"\n".join(parts)


def encode_pdf(
    pages,
    compress: bool = False,
    version: str = "1.4",
) -> bytes:
    """Build a complete, structurally valid PDF.

    ``pages``: list of pages; each page is a list of text fragments
    ``(x, y, text)`` or ``(x, y, text, tj_split)``. ``compress=True``
    wraps every content stream in ``/Filter /FlateDecode`` (zlib).

    Object layout: 1=Catalog, 2=Pages, then (Page, Contents) pairs,
    last=Font. The xref table carries real byte offsets; the trailer
    points at the catalog. The parser consumes exactly this structure
    *through the xref*, so a wrong offset fails round-trip tests.
    """
    objs: list[bytes] = []  # body of object i+1
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + 2 * p) for p in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))
    for p, frags in enumerate(pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (4 + 2 * p, font_num)
        )
        data = _content_stream(frags)
        if compress:
            data = zlib.compress(data, 6)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objs.append(head + b"\nstream\n" + data + b"\nendstream")
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    buf = bytearray()
    buf += b"%%PDF-%s\n" % version.encode("ascii")
    # binary-comment line recommended by the spec for 8-bit transports
    buf += b"%\xe2\xe3\xcf\xd3\n"
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i
        buf += body
        buf += b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


# --------------------------------------------------------------- tokens

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Shared tokenizer for object bodies and content streams."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek(self) -> int:
        self._skip_ws()
        if self.pos >= len(self.data):
            return -1
        return self.data[self.pos]

    def _regular_run(self) -> bytes:
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos]

    def next_token(self):
        """→ ('name', str) | ('num', float) | ('str', str) |
        ('kw', bytes) | ('dict_open'|'dict_close'|'arr_open'|
        'arr_close', None) | ('eof', None)."""
        c = self.peek()
        if c < 0:
            return ("eof", None)
        d = self.data
        if c == 0x2F:  # /Name
            self.pos += 1
            raw = self._regular_run()
            return ("name", _decode_name(raw))
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # << or <hex>
            if d[self.pos : self.pos + 2] == b"<<":
                self.pos += 2
                return ("dict_open", None)
            return ("str", self._hex_string())
        if c == 0x3E:
            if d[self.pos : self.pos + 2] != b">>":
                raise PdfError("lone '>' in object data")
            self.pos += 2
            return ("dict_close", None)
        if c == 0x5B:
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:
            self.pos += 1
            return ("arr_close", None)
        if c in b"+-.0123456789":
            raw = self._regular_run()
            try:
                return ("num", float(raw))
            except ValueError as exc:
                raise PdfError(f"bad numeric token {raw!r}") from exc
        raw = self._regular_run()
        if not raw:
            raise PdfError(f"unexpected byte {bytes([c])!r} at {self.pos}")
        return ("kw", raw)

    def _literal_string(self) -> str:
        """Balanced-paren literal string with §7.3.4.2 escapes."""
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x28
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n",
                        0x72: b"\r",
                        0x74: b"\t",
                        0x62: b"\b",
                        0x66: b"\f",
                    }[e]
                    self.pos += 1
                elif e in b"01234567":
                    oct_digits = bytearray()
                    while (
                        self.pos < n
                        and len(oct_digits) < 3
                        and d[self.pos] in b"01234567"
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # \( \) \\ and "ignore the backslash" rule
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return out.decode("latin-1")
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated literal string")

    def _hex_string(self) -> str:
        d = self.data
        end = d.find(b">", self.pos)
        if end < 0:
            raise PdfError("unterminated hex string")
        hx = bytes(c for c in d[self.pos + 1 : end] if c not in _WS)
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
        except ValueError as exc:
            raise PdfError("bad hex string") from exc


def _decode_name(raw: bytes) -> str:
    """#xx hex escapes inside names (§7.3.5)."""
    if b"#" not in raw:
        return raw.decode("latin-1")
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i] == 0x23 and i + 2 < len(raw):
            out.append(int(raw[i + 1 : i + 3], 16))
            i += 3
        else:
            out.append(raw[i])
            i += 1
    return out.decode("latin-1")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(lex: _Lexer, tok=None):
    """Recursive-descent object value: dict/array/number/string/name/
    ref/bool/null. Indirect references ``N G R`` are folded by
    lookahead on the number path."""
    if tok is None:
        tok = lex.next_token()
    kind, val = tok
    if kind == "dict_open":
        d = {}
        while True:
            t = lex.next_token()
            if t[0] == "dict_close":
                return d
            if t[0] != "name":
                raise PdfError(f"dict key must be a name, got {t}")
            d[t[1]] = _parse_value(lex)
    if kind == "arr_open":
        arr = []
        while True:
            t = lex.next_token()
            if t[0] == "arr_close":
                return arr
            arr.append(_parse_value(lex, t))
        return arr
    if kind == "num":
        # lookahead for "G R"
        save = lex.pos
        t2 = lex.next_token()
        if t2[0] == "num":
            save2 = lex.pos
            t3 = lex.next_token()
            if t3 == ("kw", b"R"):
                return _Ref(int(val))
            lex.pos = save2
        lex.pos = save
        return int(val) if float(val).is_integer() else val
    if kind in ("str", "name"):
        return val
    if kind == "kw":
        if val == b"true":
            return True
        if val == b"false":
            return False
        if val == b"null":
            return None
        raise PdfError(f"unexpected keyword {val!r} in object value")
    raise PdfError(f"unexpected token {tok} in object value")


# --------------------------------------------------------------- parser


class _Document:
    def __init__(self, data: bytes):
        self.data = data
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._load_xref()

    def _load_xref(self) -> None:
        d = self.data
        tail = d[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("no startxref")
        pos = int(m.group(1))
        seen = set()
        while True:
            if pos in seen or pos < 0 or pos >= len(d):
                raise PdfError("bad xref offset")
            seen.add(pos)
            if d[pos : pos + 4] != b"xref":
                raise PdfError("xref keyword missing at startxref offset")
            lex = _Lexer(d, pos + 4)
            # one or more subsections: "start count" then 20-byte rows
            while True:
                save = lex.pos
                t = lex.next_token()
                if t == ("kw", b"trailer"):
                    break
                if t[0] != "num":
                    raise PdfError("malformed xref subsection header")
                start = int(t[1])
                t2 = lex.next_token()
                if t2[0] != "num":
                    raise PdfError("malformed xref subsection header")
                count = int(t2[1])
                lex._skip_ws()
                row_at = lex.pos
                for k in range(count):
                    row = d[row_at + 20 * k : row_at + 20 * k + 20]
                    if len(row) < 18:
                        raise PdfError("truncated xref row")
                    off = int(row[0:10])
                    typ = row[17:18]
                    num = start + k
                    if typ == b"n" and num not in self.xref:
                        self.xref[num] = off
                lex.pos = row_at + 20 * count
            trailer = _parse_value(lex)
            if not isinstance(trailer, dict):
                raise PdfError("trailer is not a dictionary")
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            prev = trailer.get("Prev")
            if prev is None:
                return
            pos = int(prev)

    def resolve(self, v):
        if isinstance(v, _Ref):
            return self.get_object(v.num)
        return v

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num)
        if off is None:
            raise PdfError(f"object {num} not in xref")
        lex = _Lexer(self.data, off)
        t1, t2, t3 = lex.next_token(), lex.next_token(), lex.next_token()
        if t1[0] != "num" or int(t1[1]) != num or t3 != ("kw", b"obj"):
            raise PdfError(f"object header mismatch for {num} at {off}")
        val = _parse_value(lex)
        nxt = lex.next_token()
        if nxt == ("kw", b"stream"):
            if not isinstance(val, dict):
                raise PdfError("stream without a dictionary")
            # EOL after 'stream' is CRLF or LF
            p = lex.pos
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int):
                raise PdfError("stream /Length missing or non-integer")
            raw = self.data[p : p + length]
            if len(raw) != length:
                raise PdfError("stream truncated")
            val = dict(val)
            val["__stream__"] = raw
        self._cache[num] = val
        return val

    def stream_data(self, obj: dict) -> bytes:
        raw = obj.get("__stream__")
        if raw is None:
            raise PdfError("not a stream object")
        filt = self.resolve(obj.get("Filter"))
        filters = (
            []
            if filt is None
            else [filt]
            if isinstance(filt, str)
            else [self.resolve(f) for f in filt]
        )
        for f in filters:
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise PdfError("FlateDecode failed") from exc
            else:
                raise PdfError(f"unsupported filter {f!r}")
        return raw


def _walk_pages(doc: _Document, node: dict, out: list, depth: int = 0) -> None:
    if depth > 32:
        raise PdfError("page tree too deep")
    typ = doc.resolve(node.get("Type"))
    if typ == "Pages":
        kids = doc.resolve(node.get("Kids"))
        if not isinstance(kids, list):
            raise PdfError("/Pages without /Kids array")
        for kid in kids:
            kid_obj = doc.resolve(kid)
            if not isinstance(kid_obj, dict):
                raise PdfError("page-tree kid is not a dictionary")
            _walk_pages(doc, kid_obj, out, depth + 1)
    elif typ == "Page":
        out.append(node)
    else:
        raise PdfError(f"unexpected page-tree node type {typ!r}")


def _extract_text(content: bytes) -> list[tuple[float, float, str]]:
    """Content stream → positioned fragments in emission order.

    Tracks the §9.4.2 text-positioning state: ``Td``/``TD`` translate
    the line start, ``Tm`` sets it from the matrix's (e, f), ``TL``
    sets the leading consumed by ``T*`` and ``'``. Each ``Tj``/``'``/
    ``TJ`` emits one fragment at the current line start (glyph-width
    advances within a show are typography, not content). Non-text
    operators are skipped operand-correctly via the shared lexer.
    """
    lex = _Lexer(content)
    frags: list[tuple[float, float, str]] = []
    operands: list = []
    lx = ly = 0.0
    leading = 0.0
    in_text = False
    while True:
        tok = lex.next_token()
        kind, val = tok
        if kind == "eof":
            break
        if kind in ("num", "str", "name"):
            operands.append(val)
            continue
        if kind == "arr_open":
            operands.append(_parse_value(lex, tok))
            continue
        if kind == "dict_open":
            operands.append(_parse_value(lex, tok))
            continue
        if kind in ("arr_close", "dict_close"):
            raise PdfError("unbalanced bracket in content stream")
        op = val  # keyword bytes
        if op == b"BT":
            in_text = True
            lx = ly = 0.0
        elif op == b"ET":
            in_text = False
        elif op == b"Td" and len(operands) >= 2:
            lx += float(operands[-2])
            ly += float(operands[-1])
        elif op == b"TD" and len(operands) >= 2:
            leading = -float(operands[-1])
            lx += float(operands[-2])
            ly += float(operands[-1])
        elif op == b"Tm" and len(operands) >= 6:
            lx = float(operands[-2])
            ly = float(operands[-1])
        elif op == b"TL" and len(operands) >= 1:
            leading = float(operands[-1])
        elif op == b"T*":
            ly -= leading
        elif op == b"Tj" and operands and in_text:
            frags.append((lx, ly, str(operands[-1])))
        elif op == b"'" and operands and in_text:
            ly -= leading
            frags.append((lx, ly, str(operands[-1])))
        elif op == b"TJ" and operands and in_text:
            arr = operands[-1]
            if isinstance(arr, list):
                text = "".join(e for e in arr if isinstance(e, str))
                frags.append((lx, ly, text))
        operands = []
    return frags


def parse_pdf(data: bytes, with_widths: bool = False):
    """Full-document parse → ``(version, pages)`` where ``pages`` is a
    list of fragment lists ``[(x, y, text), ...]`` in content-stream
    emission order, plus a flag set: ``compressed`` true if any page
    stream carried ``/FlateDecode``.

    Returns ``(version: str, pages: list, compressed: bool,
    n_objects: int)`` — or, with ``with_widths=True``, a 5-tuple whose
    last element is the per-page MediaBox width (``x2 - x0`` from the
    page's ``/MediaBox``, falling back to the root page-tree node's
    box per the inheritable-attribute rule, else the 612.0 US-Letter
    default). Raises :class:`PdfError` on any structural violation —
    there is no scavenging fallback, so a corrupt xref is *detected*,
    not papered over.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF header")
    eol = data.find(b"\n")
    version = data[5 : eol if eol > 0 else 16].strip(b"\r ").decode(
        "latin-1", "replace"
    )
    doc = _Document(data)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfError("trailer /Root unresolvable")
    pages_node = doc.resolve(root.get("Pages"))
    if not isinstance(pages_node, dict):
        raise PdfError("catalog /Pages unresolvable")
    page_dicts: list[dict] = []
    _walk_pages(doc, pages_node, page_dicts)
    compressed = False
    pages = []
    widths: list[float] = []
    root_box = doc.resolve(pages_node.get("MediaBox"))
    for pg in page_dicts:
        box = doc.resolve(pg.get("MediaBox"))
        if not (isinstance(box, list) and len(box) == 4):
            box = root_box if isinstance(root_box, list) and len(
                root_box
            ) == 4 else [0, 0, 612, 792]
        widths.append(float(doc.resolve(box[2])) - float(doc.resolve(box[0])))
        contents = doc.resolve(pg.get("Contents"))
        if contents is None:
            pages.append([])
            continue
        chunks = contents if isinstance(contents, list) else [contents]
        buf = bytearray()
        for ch in chunks:
            obj = doc.resolve(ch)
            if not isinstance(obj, dict) or "__stream__" not in obj:
                raise PdfError("/Contents is not a stream")
            if doc.resolve(obj.get("Filter")) is not None:
                compressed = True
            buf += doc.stream_data(obj)
            buf += b"\n"
        pages.append(_extract_text(bytes(buf)))
    if with_widths:
        return version, pages, compressed, len(doc.xref), widths
    return version, pages, compressed, len(doc.xref)


def reading_order(frags):
    """Sort fragments top-to-bottom then left-to-right — the webtext
    analog of ``sorted_boxes`` (tools/infer/predict_system.py): primary
    key descending y (PDF origin is bottom-left), secondary ascending
    x. Emission order in the stream is typography, not reading order."""
    return sorted(frags, key=lambda f: (-f[1], f[0]))


# Frozen layout width model: a fragment's x-extent is
# x .. x + CHAR_ADVANCE * len(text). 12 pt Helvetica averages ~6.7
# units per glyph; 6.0 is deliberately frozen (a layout heuristic the
# oracle can restate exactly, not typography — glyph metrics are not
# parsed).
CHAR_ADVANCE = 6.0


def column_layout_order(frags, page_width: float = 612.0):
    """Two-column reading order — the analog of the reference's
    ``sorted_layout_boxes`` (ppstructure/recovery/recovery_to_doc.py:
    81-140, the multi-column layout recovery that plain ``sorted_boxes``
    cannot express): fragments are walked top-to-bottom (descending y —
    PDF origin is bottom-left — then ascending x) and classified
    against the column grid exactly as the reference classifies layout
    boxes against the page width ``w``:

    * **left column** — starts left of ``w/4`` AND ends left of
      ``3w/4`` (reference: ``x0 < w/4 and x2 < 3*w/4``),
    * **right column** — starts right of ``w/4`` AND ends right of
      ``w/2`` (reference: ``x0 > w/4 and x2 > w/2``),
    * **full-width spanner** — anything else: both pending columns are
      flushed (left then right, each in walk order) and the spanner is
      emitted. A trailing flush emits the final columns.

    The fragment x-extent uses the frozen :data:`CHAR_ADVANCE` width
    model. Returns ``[(frag, side), ...]`` in reading order with
    ``side`` ∈ ``'left' | 'right' | 'single'`` — the classification
    the walk actually used (the reference's per-box ``'double'`` label
    is ``side != 'single'``). On a genuinely two-column page this
    differs from :func:`reading_order`, which interleaves the columns
    row by row — the exact failure the reference's recovery path
    exists to fix (W2 in SURVEY §2).
    """
    out: list = []
    left: list = []
    right: list = []
    q1, mid, q3 = page_width / 4.0, page_width / 2.0, 3.0 * page_width / 4.0
    for f in reading_order(frags):
        x = f[0]
        x2 = x + CHAR_ADVANCE * len(f[2])
        if x < q1 and x2 < q3:
            left.append((f, "left"))
        elif x > q1 and x2 > mid:
            right.append((f, "right"))
        else:
            out += left
            out += right
            left, right = [], []
            out.append((f, "single"))
    out += left
    out += right
    return out
