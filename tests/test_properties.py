"""Property-based tests (hypothesis): the invariants that hold for ANY
input, not just fixtures — extraction totality/idempotence, the
span-slice invariant (FIXTURES.md), charset-decode totality, and
scorer/merger structural properties."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from webextract.config import DEFAULT_CONFIG, ExtractConfig
from webextract.functions.extract import extract_page
from webextract.functions.htmlnorm import decode_html
from webextract.functions.tokenizer import tokenize_blocks

# html-ish soup: text, tags, entities, brokenness
_tag_names = st.sampled_from(
    ["p", "div", "a", "b", "script", "pre", "nav", "h1", "li", "td", "x1"]
)
_chunk = st.one_of(
    st.text(alphabet=string.ascii_letters + " .,!?", min_size=0, max_size=40),
    _tag_names.map(lambda t: f"<{t}>"),
    _tag_names.map(lambda t: f"</{t}>"),
    _tag_names.map(lambda t: f"<{t}/>"),
    st.sampled_from(
        ["&amp;", "&lt;", "&#65;", "&#x2014;", "&bogus;", "&", "<", ">",
         "<!-- c -->", "<!--", "<!doctype html>", "<?pi?>", "</", "<3",
         "\r\n", "\t", " ", "  "]
    ),
)
_html_soup = st.lists(_chunk, min_size=0, max_size=60).map("".join)


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_extraction_total_and_deterministic(soup: str) -> None:
    raw = soup.encode("utf-8")
    r1 = extract_page(raw, DEFAULT_CONFIG)
    r2 = extract_page(raw, DEFAULT_CONFIG)
    assert r1["text"] == r2["text"]
    assert r1["spans"] == r2["spans"]
    assert r1["blocks_kept"] <= r1["blocks_total"]


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_span_slice_invariant(soup: str) -> None:
    """The FIXTURES.md invariant: joining doc_text[start:end] over the
    spans with the frozen separator reproduces the output text
    byte-for-byte."""
    raw = soup.encode("utf-8")
    blocks = tokenize_blocks(decode_html(raw))
    doc_text = blocks["doc_text"]
    r = extract_page(raw, DEFAULT_CONFIG)
    rebuilt = DEFAULT_CONFIG.separator.join(
        doc_text[s:e] for (_b, s, e, _t, _sc) in r["spans"]
    )
    assert rebuilt == r["text"]


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_tokenizer_offsets_are_consistent(soup: str) -> None:
    blocks = tokenize_blocks(soup)
    doc_text = blocks["doc_text"]
    for i, text in enumerate(blocks["text"]):
        s, e = blocks["start"][i], blocks["end"][i]
        assert doc_text[s:e] == text
        assert blocks["text_len"][i] == len(text)
        assert blocks["link_text_len"][i] <= len(text) or blocks["is_pre"][i]


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_decode_total_on_arbitrary_bytes(raw: bytes) -> None:
    # never raises, always returns str (DecodeImage-analog totality)
    out = decode_html(raw)
    assert isinstance(out, str)
    # and extraction is total too
    extract_page(raw, DEFAULT_CONFIG)


@given(_html_soup, st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_max_blocks_cap_respected(soup: str, cap: int) -> None:
    cfg = ExtractConfig(max_blocks=cap)
    r = extract_page(soup.encode(), cfg)
    assert r["blocks_kept"] <= cap


def test_truncation_guard() -> None:
    cfg = ExtractConfig(max_html_bytes=64)
    big = b"<p>" + b"x" * 1000 + b"</p>"
    r = extract_page(big, cfg)
    assert r["truncated"] is True
    assert r["bytes_in"] == len(big)
