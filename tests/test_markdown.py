"""Markdown rendering mode (cfg.markdown=True): tag decorations,
default-off byte-frozen passthrough, and the decorated span-slice
invariant."""

from __future__ import annotations

from webextract.config import DEFAULT_CONFIG, ExtractConfig
from webextract.functions.extract import extract_page
from webextract.functions.htmlnorm import decode_html
from webextract.functions.merger import md_decorate
from webextract.functions.tokenizer import tokenize_blocks

HTML = (
    b"<html><body><article>"
    b"<h1>Title one</h1>"
    b"<h3>Sub section heading three</h3>"
    b"<p>A plain paragraph with enough words to score well here.</p>"
    b"<ul><li>first item of the list</li><li>second item of the list</li></ul>"
    b"<blockquote>a quoted passage of text</blockquote>"
    b"<pre>code sample line</pre>"
    b"</article></body></html>"
)

KEEP_ALL = ExtractConfig(drop_score=0.0, markdown=True)


def test_md_decorate_forms():
    assert md_decorate("h1", "T") == "# T"
    assert md_decorate("h6", "T") == "###### T"
    assert md_decorate("li", "x") == "- x"
    assert md_decorate("blockquote", "q") == "> q"
    assert md_decorate("pre", "c") == "```\nc\n```"
    assert md_decorate("p", "t") == "t"
    assert md_decorate("td", "t") == "t"


def test_markdown_rendering_end_to_end():
    text = extract_page(HTML, KEEP_ALL)["text"]
    parts = text.split(DEFAULT_CONFIG.separator)
    assert "# Title one" in parts
    assert "### Sub section heading three" in parts
    assert "A plain paragraph with enough words to score well here." in parts
    assert "- first item of the list" in parts
    assert "- second item of the list" in parts
    assert "> a quoted passage of text" in parts
    assert "```\ncode sample line\n```" in parts


def test_default_off_is_byte_frozen():
    plain = extract_page(HTML, ExtractConfig(drop_score=0.0))["text"]
    assert "# " not in plain and "- first" not in plain and "```" not in plain
    # markdown differs ONLY by decorations: stripping them gives plain
    md = extract_page(HTML, KEEP_ALL)["text"]
    assert md != plain


def test_markdown_span_slice_invariant():
    # spans always slice the RAW block text; the output is the join of
    # the DECORATED slices — the markdown form of the FIXTURES.md rule
    r = extract_page(HTML, KEEP_ALL)
    doc_text = tokenize_blocks(decode_html(HTML))["doc_text"]
    rebuilt = DEFAULT_CONFIG.separator.join(
        md_decorate(tag, doc_text[s:e]) for (_b, s, e, tag, _sc) in r["spans"]
    )
    assert rebuilt == r["text"]
