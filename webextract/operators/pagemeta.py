"""Page-metadata extraction: title / meta-description / h1 / link
count straight off the raw html bytes, all JVM-side.

The metadata companion to the canonical-link and robots-meta gates
(urlnorm.py): a crawl pipeline reads these fields for indexing and
quality triage long before full extraction runs. The reference's
analog is the per-image metadata pass before recognition (shape /
orientation probes in tools/infer/predict_system.py:64-75) — cheap
fields pulled ahead of the heavy stage.

Whole operator is three ``regexp_extract`` + one
``regexp_extract_all`` over the decoded html inside whole-stage
codegen — it fuses into the scan, reads only the html column, and
never leaves the JVM. At 10^12 pages this is a pure map stage: no
shuffle, no skew surface.

Regex semantics (frozen, mirrored in the oracle): first match wins;
DOTALL so multi-line heads work; lazy bodies so nested tags stop at
the first close; missing fields come back as empty string and are
NULLed for honesty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
META_DESC_RE = (
    r'(?is)<meta\s+name="description"\s+content="([^"]*)"'
)
H1_RE = r"(?is)<h1[^>]*>(.*?)</h1>"
ANCHOR_RE = r"(?i)<a[\s>]"


def _nullif_empty(col):
    return F.when(col == "", None).otherwise(col)


def page_meta(pages: DataFrame) -> DataFrame:
    """(url, title, meta_description, h1, n_links) from raw html."""
    html = F.decode(F.col("html"), "UTF-8")
    return pages.select(
        "url",
        _nullif_empty(F.regexp_extract(html, TITLE_RE, 1)).alias("title"),
        _nullif_empty(F.regexp_extract(html, META_DESC_RE, 1)).alias(
            "meta_description"
        ),
        _nullif_empty(F.regexp_extract(html, H1_RE, 1)).alias("h1"),
        F.size(F.regexp_extract_all(html, F.lit(ANCHOR_RE), 0)).alias("n_links"),
    )
