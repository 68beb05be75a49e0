"""Block scorer: vectorized content-vs-boilerplate classification.

The analog of the reference's DB postprocess (region proposal scoring +
thresholding): ``DBPostProcess.__call__`` thresholds a probability map,
scores each candidate region with a masked mean (``box_score_fast``,
ppocr/postprocess/db_postprocess.py:182-197,220-246) and drops regions
below ``box_thresh``. Here the "probability" is a frozen linear blend
of text-density, link-density, tag-prior and depth features, computed
with numpy over the whole block table at once (no per-block Python).

Also implements:
 * score_mode "slow" — the ``box_score_slow`` analog
   (db_postprocess.py:199-218, selected at :131-133): the content-mass
   evidence is measured over the exact non-link text (the polygon
   mean) instead of the whole block extent (the bbox mean). Opt-in;
   default "fast" keeps goldens byte-frozen;
 * neighbor smoothing — the ``use_dilation`` analog
   (db_postprocess.py:54-55): a near-miss block sandwiched between two
   kept blocks is rescued;
 * per-page top-K cap — the ``max_candidates`` analog
   (db_postprocess.py:37,120).
"""

from __future__ import annotations

import numpy as np

from webextract.config import DEFAULT_TAG_BONUS, TAG_BONUS, ExtractConfig


def score_blocks(blocks: dict[str, list], cfg: ExtractConfig) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(scores: float64[K], keep: bool[K])`` for one block table."""
    k = len(blocks["block_id"])
    if k == 0:
        return np.zeros(0), np.zeros(0, dtype=bool)

    text_len = np.asarray(blocks["text_len"], dtype=np.float64)
    link_len = np.asarray(blocks["link_text_len"], dtype=np.float64)
    depth = np.asarray(blocks["depth"], dtype=np.float64)
    boiler = np.asarray(blocks["is_boiler"], dtype=np.float64)
    tag_bonus = np.array(
        [TAG_BONUS.get(t, DEFAULT_TAG_BONUS) for t in blocks["tag"]], dtype=np.float64
    )

    # score_mode analog (db_postprocess.py:40-43,131-133): "fast"
    # measures content mass over the block's whole text extent (the
    # bbox mean); "slow" over the exact non-link content only (the
    # polygon mean — anchor glyphs excluded from the evidence).
    if cfg.score_mode == "slow":
        content_len = np.maximum(text_len - link_len, 0.0)
    else:
        content_len = text_len
    len_score = np.minimum(content_len, cfg.len_norm) / cfg.len_norm
    link_density = link_len / np.maximum(text_len, 1.0)
    depth_pen = np.minimum(np.maximum(depth - cfg.depth_norm, 0.0) / cfg.depth_norm, 1.0)

    raw = (
        cfg.w_tag * tag_bonus
        + cfg.w_len * len_score
        + cfg.w_link * (1.0 - link_density)
        - cfg.w_depth * depth_pen
        - cfg.w_boiler * boiler
    )
    scores = np.clip(raw, 0.0, 1.0)
    keep = scores >= cfg.drop_score

    # neighbor smoothing (dilation analog): rescue near-misses between
    # two kept blocks. One pass, computed on the pre-smoothing mask.
    if k >= 3 and cfg.smooth_margin > 0.0:
        near = (~keep) & (scores >= cfg.drop_score - cfg.smooth_margin)
        sandwiched = np.zeros(k, dtype=bool)
        sandwiched[1:-1] = keep[:-2] & keep[2:]
        keep = keep | (near & sandwiched)

    # top-K cap (max_candidates analog): keep the K highest-scoring,
    # ties broken by document order (stable argsort on -score).
    if int(keep.sum()) > cfg.max_blocks:
        kept_idx = np.flatnonzero(keep)
        order = kept_idx[np.argsort(-scores[kept_idx], kind="stable")]
        keep = np.zeros(k, dtype=bool)
        keep[order[: cfg.max_blocks]] = True

    return scores, keep
