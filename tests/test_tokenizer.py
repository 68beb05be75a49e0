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
