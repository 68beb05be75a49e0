"""Charset sniff/decode rules (frozen — byte-identity depends on them)."""

from webextract.functions.htmlnorm import decode_html, sniff_charset


def test_utf8_plain():
    assert decode_html("héllo".encode()) == "héllo"
    assert sniff_charset("héllo".encode()) == "utf-8"


def test_bom_stripped():
    assert decode_html(b"\xef\xbb\xbfabc") == "abc"
    assert sniff_charset(b"\xef\xbb\xbfabc") == "utf-8-bom"


def test_meta_charset_used_when_not_utf8():
    raw = b'<meta charset="iso-8859-1"><p>caf\xe9</p>'
    assert sniff_charset(raw) == "iso-8859-1"
    assert "café" in decode_html(raw)


def test_meta_content_attr_form():
    raw = b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252"><p>\x93q\x94</p>'
    assert sniff_charset(raw) == "windows-1252"
    assert "“q”" in decode_html(raw)


def test_mismatch_meta_utf8_with_latin1_bytes_replaces():
    raw = b'<meta charset="utf-8"><p>caf\xe9</p>'
    assert decode_html(raw) == '<meta charset="utf-8"><p>caf�</p>'


def test_unknown_meta_falls_back_latin1():
    raw = b'<meta charset="no-such-codec"><p>\xe9</p>'
    assert sniff_charset(raw) == "latin-1"
    assert decode_html(raw).endswith("<p>\xe9</p>")


def test_total_function_never_raises():
    assert decode_html(b"\xff\xfe\x00\x01garbage") != ""
    assert decode_html(b"") == ""
