"""Golden-output regression — the core correctness gate.

Mirrors test_tipc/compare_results.py:103-140, tightened from
``assert_allclose(atol=1e-3)`` to BYTE equality per url (north rule).
Goldens were cut once by scripts/cut_goldens.py and are FROZEN.
"""

import json
import pathlib

import pytest

from webextract.config import DEFAULT_CONFIG as CFG
from webextract.functions import extract_page
from webextract.sources.pages import gen_fixture_pages

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "goldens" / "golden.json").read_text()
)
PAGES = {p["url"]: p for p in gen_fixture_pages()}


def test_every_fixture_has_a_golden():
    assert set(PAGES) == set(GOLDEN)


@pytest.mark.parametrize("url", sorted(GOLDEN), ids=lambda u: u.split("/", 3)[-1])
def test_byte_identical_extraction(url):
    g = GOLDEN[url]
    r = extract_page(PAGES[url]["html"], CFG)
    assert r["text"] == g["text"], f"text drift for {g['case']}"
    assert [list(s) for s in r["spans"]] == g["spans"]
    assert r["blocks_kept"] == g["blocks_kept"]
    assert r["blocks_total"] == g["blocks_total"]


def test_corpus_pass_rate_is_total():
    # the BASELINE metric: byte-identical pass rate must be 100%
    passed = sum(
        extract_page(PAGES[u]["html"], CFG)["text"] == GOLDEN[u]["text"] for u in GOLDEN
    )
    assert passed == len(GOLDEN)
