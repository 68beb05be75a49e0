"""Mojibake classifier + repair (ExtractConfig.fix_mojibake; the
use_angle_cls classify-then-correct analog). Default-off path frozen."""

from webextract.config import ExtractConfig
from webextract.functions.extract import extract_page
from webextract.functions.mojibake import fix_mojibake, mojibake_score


def garble(s: str) -> str:
    """Simulate the classic upstream bug: utf-8 bytes read as latin-1."""
    return s.encode("utf-8").decode("latin-1")


def test_score_fires_on_double_encoded_text():
    clean = "café déclarée naïve — fine text"
    assert mojibake_score(clean) == 0
    assert mojibake_score(garble(clean)) >= 2


def test_fix_restores_latin1_garbled():
    clean = "café déclarée naïve résumé"
    assert fix_mojibake(garble(clean)) == clean


def test_fix_restores_cp1252_garbled_punctuation():
    # ’ and — garble via cp1252 into â€™ / â€” (0x99→™, 0x94→”);
    # (“ ” are excluded: their 0x9D byte is a cp1252 hole and real
    # garbling of those goes through latin-1, covered above)
    clean = "it’s a test — with em-dashes — and apostrophes’ galore"
    garbled = clean.encode("utf-8").decode("cp1252")
    assert fix_mojibake(garbled) == clean


def test_healthy_text_untouched():
    for s in (
        "plain ascii text stays put",
        "café déclarée naïve",                 # real accents, no mojibake
        "Ã is a legitimate single letter",     # below threshold
        "日本語のテキストはそのまま",            # non-encodable → unchanged
    ):
        assert fix_mojibake(s) == s


def test_fix_is_idempotent():
    clean = "café déclarée"
    once = fix_mojibake(garble(clean))
    assert fix_mojibake(once) == once


def test_extract_page_flag():
    clean = "café déclarée naïve résumé and plenty of prose to keep the block"
    html = f"<html><body><p>{garble(clean)}</p></body></html>".encode()
    off = extract_page(html, ExtractConfig())
    on = extract_page(html, ExtractConfig(fix_mojibake=True))
    assert garble(clean) in off["text"]          # default: passthrough
    assert clean in on["text"]                   # flagged: repaired
