"""Scorer unit tests: thresholding, boiler penalty, cap, smoothing."""

import dataclasses

import numpy as np

from webextract.config import DEFAULT_CONFIG as CFG
from webextract.config import ExtractConfig
from webextract.functions.scorer import score_blocks
from webextract.functions.tokenizer import tokenize_blocks


def _score(html: str, cfg: ExtractConfig = CFG):
    b = tokenize_blocks(html)
    s, k = score_blocks(b, cfg)
    return b, s, k


def test_content_paragraph_kept():
    _, s, k = _score("<p>" + "prose " * 30 + "</p>")
    assert k[0] and s[0] >= CFG.drop_score


def test_nav_links_dropped():
    _, s, k = _score("<nav>" + " ".join(f"<a href='/{i}'>L{i}</a>" for i in range(8)) + "</nav>")
    assert not k.any()


def test_footer_link_paragraph_dropped():
    _, s, k = _score("<footer><p><a href='/t'>Terms of Service</a> <a href='/p'>Privacy</a></p></footer>")
    assert not k.any()


def test_link_density_hurts():
    b, s, _ = _score("<p><a href='/'>" + "link " * 30 + "</a></p><p>" + "text " * 30 + "</p>")
    assert s[0] < s[1]


def test_depth_penalty():
    shallow = _score("<p>" + "w " * 50 + "</p>")[1][0]
    deep = _score("<div>" * 30 + "<p>" + "w " * 50 + "</p>" + "</div>" * 30)[1][0]
    assert deep < shallow


def test_topk_cap():
    cfg = dataclasses.replace(CFG, max_blocks=5)
    html = "".join(f"<p>{'word ' * 40}{i}</p>" for i in range(20))
    _, _, k = _score(html, cfg)
    assert int(k.sum()) == 5


def _block_table(rows):
    keys = ["tag", "depth", "text", "text_len", "link_text_len", "is_boiler"]
    t = {k: [r[i] for r in rows] for i, k in enumerate(keys)}
    t["block_id"] = list(range(len(rows)))
    t["n_links"] = [0] * len(rows)
    t["is_pre"] = [False] * len(rows)
    t["start"] = [0] * len(rows)
    t["end"] = [r[3] for r in rows]
    return t


def test_neighbor_smoothing_rescues_sandwiched():
    # middle block: div, depth 30 (full depth penalty), 100 chars →
    # raw = .35*.5 + .45*.25 + .3 - .2 = 0.3875 ∈ [drop-margin, drop)
    rows = [
        ("p", 2, "x" * 400, 400, 0, False),
        ("div", 30, "y" * 100, 100, 0, False),
        ("p", 2, "z" * 400, 400, 0, False),
    ]
    t = _block_table(rows)
    _, k = score_blocks(t, dataclasses.replace(CFG, smooth_margin=0.15))
    assert k.tolist() == [True, True, True]
    _, k0 = score_blocks(t, dataclasses.replace(CFG, smooth_margin=0.0))
    assert k0.tolist() == [True, False, True]


def test_empty_table():
    s, k = score_blocks(tokenize_blocks(""), CFG)
    assert len(s) == 0 and len(k) == 0


def test_scores_in_unit_interval():
    _, s, _ = _score("<nav><p><a href='/'>x</a></p></nav><p>" + "w " * 500 + "</p>")
    assert np.all((s >= 0.0) & (s <= 1.0))


def test_score_mode_slow_excludes_link_mass():
    """box_score_slow analog (db_postprocess.py:199-218): the slow mask
    measures content on non-link text only, so a long block whose mass
    is mostly anchor text scores strictly lower than under fast mode;
    a link-free block scores identically under both."""
    html = (
        "<p><a href='/'>" + "link " * 60 + "</a>" + "tail " * 6 + "</p>"
        "<p>" + "prose " * 60 + "</p>"
    )
    slow_cfg = dataclasses.replace(CFG, score_mode="slow")
    _, fast, _ = _score(html)
    _, slow, _ = _score(html, slow_cfg)
    assert slow[0] < fast[0]          # link-heavy: finer mask demotes
    assert slow[1] == fast[1]         # pure prose: masks coincide


def test_score_mode_default_is_frozen_fast():
    import pytest

    assert CFG.score_mode == "fast"
    with pytest.raises(ValueError):
        ExtractConfig(score_mode="exact")
