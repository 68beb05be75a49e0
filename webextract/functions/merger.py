"""Span-merge decoder: retained blocks → final text + spans.

The analog of the reference's CTC greedy decode + result assembly:
``CTCLabelDecode`` argmaxes per step, drops repeats of the previous
step, drops blanks, and joins (ppocr/postprocess/rec_postprocess.py:
70-100,106-129); ``TextSystem`` then orders boxes (predict_system.py:
123-144) and applies ``drop_score`` (:112-117). Here:

 * document order IS reading order (the DOM is linear — our
   ``sorted_boxes`` is the identity);
 * adjacent duplicate dedup: a retained block whose text equals the
   previous retained block's text is dropped (the CTC
   neighbor-dedup analog, rec_postprocess.py:76-81);
 * retained texts join with the frozen separator; spans carry
   (block_id, start, end, tag, score) with offsets into ``doc_text``
   so ``sep.join(doc_text[s:e])`` reproduces the output byte-for-byte
   (span-slice invariant, FIXTURES.md).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from webextract.config import ExtractConfig


# markdown decorations by block tag (cfg.markdown=True): pure,
# length-transparent — spans keep slicing the raw block text, the
# OUTPUT text carries the decorated form
_MD_HEADING = {f"h{n}": "#" * n + " " for n in range(1, 7)}


def md_decorate(tag: str, text: str) -> str:
    """Markdown form of one retained block (pure function of
    (tag, text); whitespace inside ``text`` was already canonicalized
    by the tokenizer, so decorations are single-line except the pre
    fence)."""
    p = _MD_HEADING.get(tag)
    if p is not None:
        return p + text
    if tag == "li":
        return "- " + text
    if tag == "blockquote":
        return "> " + text
    if tag == "pre":
        return "```\n" + text + "\n```"
    return text


def merge_spans(
    blocks: dict[str, list],
    scores: np.ndarray,
    keep: np.ndarray,
    cfg: ExtractConfig,
) -> dict[str, Any]:
    """Return ``{text, spans, mean_score, blocks_kept}`` for one page.

    ``spans`` is a list of ``(block_id, start, end, tag, score)`` tuples
    in document order.
    """
    texts = blocks["text"]
    out_texts: list[str] = []
    spans: list[tuple[int, int, int, str, float]] = []
    span_scores: list[float] = []
    prev_text: str | None = None
    for i in np.flatnonzero(keep):
        t = texts[i]
        if prev_text is not None and t == prev_text:
            continue  # CTC-style adjacent-duplicate drop (raw text)
        out_texts.append(md_decorate(blocks["tag"][i], t) if cfg.markdown else t)
        spans.append(
            (
                int(blocks["block_id"][i]),
                int(blocks["start"][i]),
                int(blocks["end"][i]),
                blocks["tag"][i],
                float(scores[i]),
            )
        )
        span_scores.append(float(scores[i]))
        prev_text = t
    return {
        "text": cfg.separator.join(out_texts),
        "spans": spans,
        "mean_score": float(np.mean(span_scores)) if span_scores else 0.0,
        "blocks_kept": len(spans),
    }
