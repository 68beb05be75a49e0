"""DOM block tokenizer: canonical html text → columnar block table.

The analog of the reference's detection stage: where PaddleOCR's DB
detector turns an image into K quadrilateral text regions
(tools/infer/predict_det.py:271-282), we turn an HTML document into K
text blocks with char-offset spans. Output is COLUMNAR (dict of
parallel lists) so the scorer can run vectorized numpy over it —
mirroring how the reference batches crops into one tensor
(tools/infer/predict_rec.py:480) but end-to-end.

Two interchangeable event front-ends drive ONE block state machine
(``_BlockSink``):

 * the REFERENCE front-end — stdlib ``html.parser`` (tolerant,
   battle-tested, defines the frozen semantics);
 * the FAST front-end — ``webextract.functions.fastscan``, a
   compiled-regex scanner ~2-4× faster that bails back to the
   reference parser for any document containing a construct whose
   html.parser semantics it does not replicate bit-for-bit.

``tokenize_blocks(text)`` uses fast-with-fallback by default;
``engine="reference"`` forces the stdlib path (differential tests
compare the two on fixtures + fuzz, tests/test_fastscan.py).

Frozen canonicalization rules (byte-identity depends on them):
 * entities decoded (``convert_charrefs=True``): ``&amp;`` → ``&``,
   numeric refs → the codepoint;
 * within a non-``<pre>`` block, every run of unicode whitespace
   (including NBSP) collapses to one ASCII space; leading/trailing
   stripped;
 * within ``<pre>``, whitespace is verbatim except one leading and one
   trailing newline are stripped;
 * blocks that canonicalize to "" are dropped (the analog of the ≤3px
   box filter, predict_det.py:191-205);
 * content inside ``script/style/template/noscript/head/svg/iframe``
   and comments is excluded (hard-exclusion predicate, the analog of
   the out-of-region filter ppstructure/table/matcher.py:182-192);
 * ``doc_text`` = block texts joined by "\n"; block (start,end) are
   offsets into it.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any

from webextract.config import BLOCK_TAGS, BOILER_TAGS, SKIP_TAGS
from webextract.functions import fastscan

# self-closing whitespace-ish tags: contribute a space, never open blocks
_SPACING_VOID = {"br", "wbr", "hr", "img"}


def _canon(fragments: list[str]) -> str:
    """Frozen whitespace canonicalization for non-pre blocks."""
    return " ".join("".join(fragments).split())


def _canon_pre(fragments: list[str]) -> str:
    s = "".join(fragments)
    if s.startswith("\n"):
        s = s[1:]
    if s.endswith("\n"):
        s = s[:-1]
    return s


class _BlockSink:
    """The block state machine. Consumes the html.parser-equivalent
    event stream (starttag/endtag/startendtag/data) from either
    front-end and accumulates the columnar block table."""

    def __init__(self) -> None:
        self.stack: list[str] = []
        self.open_counts: dict[str, int] = {}  # per-tag open count (O(1) membership)
        self.block_stack: list[str] = []       # open BLOCK_TAGS, innermost last
        self.skip_depth = 0          # >0 ⇒ inside a SKIP_TAGS subtree
        self.boiler_depth = 0        # >0 ⇒ inside a BOILER_TAGS subtree
        self.pre_depth = 0           # >0 ⇒ inside <pre>
        self.link_depth = 0          # >0 ⇒ inside <a>
        self.frags: list[str] = []
        self.link_frags: list[str] = []
        self.n_links_in_block = 0
        self.block_tag = "body"      # nearest enclosing block tag
        self.block_was_pre = False
        self.block_boiler = False
        self.block_depth = 0
        # columnar output
        self.tags: list[str] = []
        self.depths: list[int] = []
        self.texts: list[str] = []
        self.link_lens: list[int] = []
        self.n_links: list[int] = []
        self.boilers: list[bool] = []
        self.pres: list[bool] = []

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if not self.frags:           # empty block: nothing canonicalizes
            self.link_frags = []
            self.n_links_in_block = 0
            return
        if self.block_was_pre:
            text = _canon_pre(self.frags)
        else:
            text = _canon(self.frags)
        if text:
            self.tags.append(self.block_tag)
            self.depths.append(self.block_depth)
            self.texts.append(text)
            self.link_lens.append(
                len(_canon(self.link_frags)) if self.link_frags else 0
            )
            self.n_links.append(self.n_links_in_block)
            self.boilers.append(self.block_boiler)
            self.pres.append(self.block_was_pre)
        self.frags = []
        self.link_frags = []
        self.n_links_in_block = 0

    def _begin_block(self, tag: str) -> None:
        self._flush()
        self.block_tag = tag
        self.block_depth = len(self.stack)
        self.block_boiler = self.boiler_depth > 0
        self.block_was_pre = self.pre_depth > 0

    # -- event stream ----------------------------------------------------
    def starttag(self, tag: str) -> None:
        if tag in _SPACING_VOID:
            if not self.skip_depth:
                self.frags.append(" ")
                if self.link_depth:
                    self.link_frags.append(" ")
            return
        self.stack.append(tag)
        self.open_counts[tag] = self.open_counts.get(tag, 0) + 1
        if tag in SKIP_TAGS:
            self.skip_depth += 1
        if tag in BOILER_TAGS:
            self.boiler_depth += 1
        if tag == "pre":
            self.pre_depth += 1
        if tag == "a":
            self.link_depth += 1
            self.n_links_in_block += 1
        if tag in BLOCK_TAGS:
            self.block_stack.append(tag)
            if not self.skip_depth:
                self._begin_block(tag)

    def endtag(self, tag: str) -> None:
        if tag in _SPACING_VOID:
            return
        # tolerant unwinding for malformed html: pop to nearest match
        if self.open_counts.get(tag, 0) > 0:
            while self.stack:
                t = self.stack.pop()
                self.open_counts[t] -= 1
                if t in SKIP_TAGS:
                    self.skip_depth -= 1
                if t in BOILER_TAGS:
                    self.boiler_depth -= 1
                if t == "pre":
                    self.pre_depth -= 1
                if t == "a":
                    self.link_depth -= 1
                if t in BLOCK_TAGS:
                    self.block_stack.pop()
                if t == tag:
                    break
        if tag in BLOCK_TAGS and not self.skip_depth:
            # closing a block flushes it; enclosing block tag resumes
            self._flush()
            self.block_tag = self.block_stack[-1] if self.block_stack else "body"
            self.block_depth = len(self.stack)
            self.block_boiler = self.boiler_depth > 0
            self.block_was_pre = self.pre_depth > 0

    def startendtag(self, tag: str) -> None:
        self.starttag(tag)
        if tag not in _SPACING_VOID and tag in self.stack:
            self.endtag(tag)

    def data(self, d: str) -> None:
        if self.skip_depth or not d:
            return
        self.frags.append(d)
        if self.link_depth:
            self.link_frags.append(d)


class _BlockParser(HTMLParser):
    """Reference front-end: stdlib html.parser delegating to the sink."""

    def __init__(self, sink: _BlockSink) -> None:
        super().__init__(convert_charrefs=True)
        self.sink = sink

    def handle_starttag(self, tag: str, attrs: Any) -> None:
        self.sink.starttag(tag)

    def handle_endtag(self, tag: str) -> None:
        self.sink.endtag(tag)

    def handle_startendtag(self, tag: str, attrs: Any) -> None:
        self.sink.startendtag(tag)

    def handle_data(self, data: str) -> None:
        self.sink.data(data)


def _run_reference(html_text: str) -> _BlockSink:
    sink = _BlockSink()
    p = _BlockParser(sink)
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        # malformed-input tolerance: whatever flushed so far stands
        pass
    return sink


def tokenize_blocks(html_text: str, engine: str = "auto") -> dict[str, list]:
    """Canonical html text → columnar block table.

    Returns a dict of parallel lists with keys ``block_id, tag, depth,
    text, start, end, text_len, link_text_len, n_links, is_boiler,
    is_pre``. ``start/end`` index into ``doc_text`` (block texts joined
    by "\\n"), returned under key ``doc_text``.

    ``engine``: "auto" (fast scanner, reference fallback) or
    "reference" (stdlib html.parser only — the frozen semantics).
    """
    if engine not in ("auto", "reference"):
        raise ValueError(f"tokenize_blocks: unknown engine {engine!r}")
    sink: _BlockSink | None = None
    if engine == "auto":
        s = _BlockSink()
        try:
            ok = fastscan.scan(html_text, s)
        except Exception:
            ok = False
        if ok:
            sink = s
    if sink is None:
        sink = _run_reference(html_text)
    sink._flush()

    starts: list[int] = []
    ends: list[int] = []
    off = 0
    for t in sink.texts:
        starts.append(off)
        off += len(t)
        ends.append(off)
        off += 1  # the "\n" joiner
    return {
        "block_id": list(range(len(sink.texts))),
        "tag": sink.tags,
        "depth": sink.depths,
        "text": sink.texts,
        "start": starts,
        "end": ends,
        "text_len": [len(t) for t in sink.texts],
        "link_text_len": sink.link_lens,
        "n_links": sink.n_links,
        "is_boiler": sink.boilers,
        "is_pre": sink.pres,
        "doc_text": "\n".join(sink.texts),
    }
