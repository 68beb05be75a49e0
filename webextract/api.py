"""One-call user API: the facade a reference user lands on.

The reference's public surface is two classes with mode flags —
``PaddleOCR.ocr(img, det=True, rec=True, cls=True)``
(``paddleocr.py:452,513``: det+rec = full pipeline, det-only = boxes,
rec-only = treat the input as already-cropped content, cls = opt-in
orientation repair) and ``PPStructure(...)(img)``
(``paddleocr.py:593,652`` → ``ppstructure/predict_system.py:82-176``:
layout regions + table structure + optional KIE). This module is the
API-parity recast: the same two entry points, the same flag algebra,
over DataFrames of pages instead of single images.

Everything here DELEGATES to the frozen operator stack — the facade
adds no semantics of its own, so every path stays covered by the same
goldens and oracles as the underlying operators:

================  ==========================================================
reference call    facade call / result
================  ==========================================================
ocr(det=T,rec=T)  ``WebExtractor().extract(pages)`` → (url, text, spans, …)
ocr(det=T,rec=F)  ``extract(pages, rec=False)`` → region set only (url,
                  spans, blocks_total, blocks_kept) — the dt_boxes-only
                  return ``(dt_boxes, None)`` of predict_system
ocr(det=F,rec=T)  ``extract(pages, det=False)`` → (url, text, mean_score,
                  blocks_kept): the page is treated as already-content
                  (every DOM block retained, boilerplate scoring bypassed
                  by a ``drop_score=0`` config), exactly how rec-only
                  decodes a pre-cropped line without proposing regions
cls=True          ``extract(pages, cls=True)`` → mojibake classify-then-
                  repair before tokenization (the use_angle_cls analog,
                  ``tools/infer/predict_cls.py:39-122``)
PPStructure()(x)  ``WebStructure().parse(pages)`` → typed region table;
                  ``.tables(pages)`` / ``.kie(pages)`` for the table-cell
                  and SER-pair views
================  ==========================================================
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame

from webextract.config import ExtractConfig
from webextract.operators.extract import DEFAULT_CONFIG, extract_pages

# scores are clipped to [0, 1] (functions/scorer.py) and the keep rule
# is `score >= drop_score`, so 0.0 retains every block; smoothing is
# irrelevant once everything is kept, max_blocks still caps poison pages.
_KEEP_ALL = 0.0


class WebExtractor:
    """``PaddleOCR`` analog (``paddleocr.py:452``): one object holding a
    frozen config, one ``extract`` call with the reference's flag
    algebra. Stateless and serializable — safe to build on the driver
    and use across any number of DataFrames."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def extract(
        self,
        pages: DataFrame,
        det: bool = True,
        rec: bool = True,
        cls: bool = False,
    ) -> DataFrame:
        """The ``ocr(img, det, rec, cls)`` analog (``paddleocr.py:513``).

        ``pages`` needs (url, html) columns; everything else is pruned.
        Flag semantics match the reference exactly — see the module
        table. ``det=False, rec=False`` selects nothing and raises,
        like the reference's unreachable flag pair."""
        if not det and not rec:
            raise ValueError("at least one of det/rec must be True")
        cfg = replace(self.cfg, fix_mojibake=True) if cls else self.cfg
        if det and rec:
            return extract_pages(pages, cfg)
        if det:  # det-only: the region set, no text assembly
            return extract_pages(pages, cfg).select(
                "url", "spans", "blocks_total", "blocks_kept"
            )
        # rec-only: input treated as already-content — every block kept
        rec_cfg = replace(cfg, drop_score=_KEEP_ALL, smooth_margin=0.0)
        return extract_pages(pages, rec_cfg).select(
            "url", "text", "mean_score", "blocks_kept"
        )


class WebStructure:
    """``PPStructure`` analog (``paddleocr.py:593``,
    ``ppstructure/predict_system.py:82-176``): structured-document
    views over the same page tables. Each view is the relational form
    of one element of the reference's per-page result list
    ``{type, bbox, res}`` (``predict_system.py:170-176``)."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def parse(self, pages: DataFrame) -> DataFrame:
        """Layout analysis: (url, block_id, tag, region_type,
        is_boiler, is_kept) for every DOM block — the region list of
        ``predict_system.py:111-117``."""
        from webextract.operators.layout import layout_regions

        return layout_regions(pages, self.cfg)

    def tables(self, pages: DataFrame) -> DataFrame:
        """Table-structure recovery: one row per cell with grid
        coordinates and span occupancy — the ``{cell_bbox, html}``
        result of ``ppstructure/table/predict_table.py:82-106``."""
        from webextract.operators.tables import table_cells

        return table_cells(pages, self.cfg)

    def kie(self, pages: DataFrame) -> DataFrame:
        """Key-information extraction: (url, key, value) SER pairs —
        the ``ppstructure/kie/`` analog."""
        from webextract.operators.kie import kie_pairs

        return kie_pairs(pages, self.cfg)


def extract(pages: DataFrame, **kwargs) -> DataFrame:
    """Module-level convenience: ``webextract.api.extract(pages)`` ==
    ``WebExtractor().extract(pages)`` (mirrors how the reference is
    used as ``PaddleOCR().ocr(img)`` in its README one-liner)."""
    return WebExtractor().extract(pages, **kwargs)
