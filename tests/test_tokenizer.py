"""Tokenizer unit tests: offsets, exclusions, canonicalization.

Direct per-operator tests — a discipline the reference lacks
(SURVEY.md §5.3); its correctness rides on e2e goldens only.
"""

from webextract.functions.tokenizer import tokenize_blocks


def test_offsets_slice_doc_text():
    b = tokenize_blocks("<body><p>alpha beta</p><p>gamma</p><div>delta</div></body>")
    doc = b["doc_text"]
    for i in range(len(b["block_id"])):
        assert doc[b["start"][i] : b["end"][i]] == b["text"][i]
    assert b["text"] == ["alpha beta", "gamma", "delta"]
    assert doc == "alpha beta\ngamma\ndelta"


def test_script_style_head_comments_excluded():
    b = tokenize_blocks(
        "<head><title>T</title><style>p{}</style></head>"
        "<body><script>x=1;</script><!-- gone --><template><p>ghost</p></template>"
        "<noscript>nope</noscript><p>visible</p></body>"
    )
    assert b["text"] == ["visible"]


def test_whitespace_collapse_and_entities():
    b = tokenize_blocks("<p>a\r\n  b\t\tc &amp; d &#x2014; e &nbsp; f</p>")
    assert b["text"] == ["a b c & d — e f"]


def test_pre_preserved_verbatim():
    b = tokenize_blocks("<pre>\nline  one\n  indented\n</pre>")
    assert b["text"] == ["line  one\n  indented"]
    assert b["is_pre"] == [True]


def test_empty_blocks_dropped():
    b = tokenize_blocks("<p>   </p><div></div><p>x</p>")
    assert b["text"] == ["x"]


def test_inline_tags_do_not_split():
    b = tokenize_blocks("<p>one <b>two</b> <a href='/'>three</a> four</p>")
    assert b["text"] == ["one two three four"]
    assert b["link_text_len"] == [len("three")]
    assert b["n_links"] == [1]


def test_br_contributes_space():
    b = tokenize_blocks("<p>one<br>two</p>")
    assert b["text"] == ["one two"]


def test_boiler_ancestry_flag():
    b = tokenize_blocks("<nav><div>menu</div></nav><p>content</p>")
    flags = dict(zip(b["text"], b["is_boiler"]))
    assert flags["menu"] is True
    assert flags["content"] is False


def test_malformed_does_not_raise():
    b = tokenize_blocks("<div><p>one<div>two</p></div></span></p>")
    assert "one" in b["text"] and "two" in b["text"]


def test_nested_block_tags_flush():
    b = tokenize_blocks("<div>outer head<p>inner</p>outer tail</div>")
    assert b["text"] == ["outer head", "inner", "outer tail"]
    assert b["tag"] == ["div", "p", "div"]


def test_depth_recorded():
    b = tokenize_blocks("<div><div><div><p>deep</p></div></div></div>")
    assert b["depth"][0] == 4


# -- sink bookkeeping invariants (the O(1) refactor's contract) -------------

from hypothesis import given, settings
from hypothesis import strategies as st

from webextract.config import BLOCK_TAGS
from webextract.functions.tokenizer import _BlockSink, _SPACING_VOID

_EVT_TAGS = ["div", "p", "td", "tr", "table", "a", "pre", "script",
             "nav", "span", "b", "br", "ul", "li", "body"]
_events = st.lists(
    st.tuples(st.sampled_from(["start", "end", "startend", "data"]),
              st.sampled_from(_EVT_TAGS)),
    max_size=60,
)


@given(_events)
@settings(max_examples=400, deadline=None)
def test_sink_bookkeeping_matches_stack(events):
    """open_counts and block_stack must mirror `stack` after EVERY
    event — the O(1) lookups are only correct if they never diverge
    from the structures they replaced."""
    sink = _BlockSink()
    for kind, tag in events:
        if kind == "start":
            sink.starttag(tag)
        elif kind == "end":
            sink.endtag(tag)
        elif kind == "startend":
            sink.startendtag(tag)
        else:
            sink.data("x ")
        # invariant 1: open_counts is exactly the multiset of stack —
        # compared BOTH ways (a stack entry missing from open_counts
        # must fail too)
        from collections import Counter
        nonzero = {t: n for t, n in sink.open_counts.items() if n}
        assert nonzero == dict(Counter(sink.stack)), (kind, tag, sink.stack)
        # invariant 2: block_stack is the BLOCK_TAGS subsequence of stack
        assert sink.block_stack == [t for t in sink.stack if t in BLOCK_TAGS]
        # invariant 3: depth counters never go negative
        assert sink.skip_depth >= 0 and sink.boiler_depth >= 0
        assert sink.pre_depth >= 0 and sink.link_depth >= 0
    sink._flush()  # and the sink can always flush


@given(_events)
@settings(max_examples=200, deadline=None)
def test_sink_spacing_voids_never_enter_stack(events):
    sink = _BlockSink()
    for kind, tag in events:
        if kind == "start":
            sink.starttag(tag)
        elif kind == "end":
            sink.endtag(tag)
    assert not any(t in _SPACING_VOID for t in sink.stack)
