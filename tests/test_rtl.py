"""RTL segment reversal (ExtractConfig.rtl_reverse; the arabic
pred_reverse analog). Default-off path must stay byte-identical."""

from webextract.config import ExtractConfig
from webextract.functions.extract import extract_page
from webextract.functions.rtl import rtl_segment_reverse
from webextract.sources.pages import gen_fixture_pages


def test_segment_reversal_semantics():
    # latin/digit/space runs keep internal order; other chars are
    # single segments; segment order reverses (pred_reverse mirror)
    assert rtl_segment_reverse("") == ""
    assert rtl_segment_reverse("abc 123") == "abc 123"  # one keep-run
    assert rtl_segment_reverse("سلام abc") == " abcمالس"
    assert rtl_segment_reverse("a،b") == "b،a"  # arabic comma splits runs


def test_reversal_is_length_preserving_involution_on_pure_rtl():
    s = "النص العربي يتدفق"
    r = rtl_segment_reverse(s)
    assert len(r) == len(s)
    assert sorted(r) == sorted(s)


def _rtl_fixture():
    return next(p for p in gen_fixture_pages() if p["case"] == "rtl_arabic")


def test_default_path_is_passthrough():
    page = _rtl_fixture()
    res = extract_page(page["html"], ExtractConfig())
    # frozen golden behavior: text appears in original order
    assert "النص العربي" in res["text"]


def test_flagged_path_reverses_segments_and_keeps_spans():
    page = _rtl_fixture()
    base = extract_page(page["html"], ExtractConfig())
    flagged = extract_page(page["html"], ExtractConfig(rtl_reverse=True))
    assert flagged["text"] == rtl_segment_reverse(base["text"])
    assert flagged["text"] != base["text"]
    assert len(flagged["text"]) == len(base["text"])
    # span structure identical (reversal is per-block, length-preserving)
    assert flagged["spans"] == base["spans"]


def test_flagged_path_keeps_latin_pages_unchanged():
    page = next(p for p in gen_fixture_pages() if p["case"] == "plain_article")
    base = extract_page(page["html"], ExtractConfig())
    flagged = extract_page(page["html"], ExtractConfig(rtl_reverse=True))
    # pure latin text is one keep-class run per block → unchanged
    assert flagged["text"] == base["text"]
