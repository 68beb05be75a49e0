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


HEADING_RE = r"(?is)<h[1-6][^>]*>.*?</h[1-6]>"
_HEADING_BODY_RE = r"(?is)^<h[1-6][^>]*>(.*)</h[1-6]>$"


def document_outline(pages: DataFrame) -> DataFrame:
    """(url, pos, level, heading, parent_pos) — the document's heading
    tree in reading order, each heading linked to its nearest earlier
    ancestor of strictly smaller level (h1 under nothing, h3 under the
    last h2/h1 before it, an orphan h2 before any h1 under nothing).

    The section-hierarchy analog of PP-Structure's layout tree
    (ppstructure/predict_system.py:111-117 emits typed title regions;
    recovering their nesting is this operator). All codegen: one
    regexp_extract_all + posexplode, then FIVE window aggregates that
    share a single Window node (same partition/order spec) computing
    "last position of level k before me" for k = 1..5 — parent_pos is
    a CASE over their running maxima, so no self-join and no
    quadratic ancestor search. One shuffle on url, heading lists are
    per-page bounded.
    """
    from pyspark.sql.window import Window

    html = F.decode(F.col("html"), "UTF-8")
    matches = F.regexp_extract_all(html, F.lit(HEADING_RE), 0)
    ex = pages.select("url", F.posexplode(matches).alias("pos", "m"))
    base = ex.select(
        "url",
        "pos",
        F.substring("m", 3, 1).cast("int").alias("level"),
        F.regexp_extract(F.col("m"), _HEADING_BODY_RE, 1).alias("heading"),
    )
    w = Window.partitionBy("url").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lp = {
        k: F.max(F.when(F.col("level") == k, F.col("pos"))).over(w)
        for k in range(1, 6)
    }
    cands = {k: F.coalesce(lp[k], F.lit(-1)) for k in range(1, 6)}
    parent = F.when(F.col("level") == 1, F.lit(None).cast("int"))
    for lev in range(2, 7):
        g = cands[1] if lev == 2 else F.greatest(*[cands[k] for k in range(1, lev)])
        parent = parent.when(F.col("level") == lev, F.nullif(g, F.lit(-1)))
    return base.select("url", "pos", "level", "heading", parent.alias("parent_pos"))


def heading_paths(outline: DataFrame, max_depth: int = 6) -> DataFrame:
    """(url, pos, level, heading, path): every heading with its full
    breadcrumb — ancestor headings joined with ' > ', ending in the
    heading itself (e.g. 'Intro > Methods > Data'). The section
    metadata a retrieval pipeline attaches to chunks.

    The ancestor chain is the parent_pos walk from
    :func:`document_outline`, NOT "last heading of each smaller
    level" (after <h1>A <h2>B <h1>C <h3>D, D's chain is C > D — B is
    a stale branch a per-level window would wrongly include).

    Scale shape: ONE shuffle. The outline is per-page bounded, so the
    page's headings are packed into a single array (groupBy url +
    collect_list) and the parent walk runs IN-ROW as a single
    ``aggregate`` over a ``max_depth − 1``-element sequence carrying a
    (path, cur) state struct — a RUNTIME loop, so the expression tree
    stays constant-size however deep the walk. (Two earlier shapes
    both failed at scale: the unrolled self-join paid five shuffles;
    the unrolled COLUMN loop nested its own previous hop ~3× per
    level — an exponentially growing expression that fell out of
    codegen and made this the slowest query in the suite.)
    """
    if not 1 <= max_depth <= 64:
        raise ValueError("max_depth must be in 1..64")
    packed = outline.groupBy("url").agg(
        F.collect_list(
            F.struct("pos", "level", "heading", "parent_pos")
        ).alias("hs")
    )

    def breadcrumb(hs, h):
        if max_depth == 1:
            # sequence(1, 0) would DESCEND ([1, 0]) — guard the
            # no-ancestor case instead of generating it
            return h["heading"]

        def hop(acc, _):
            anc = F.get(F.filter(hs, lambda x: x["pos"] == acc["cur"]), 0)
            return F.struct(
                F.when(
                    anc.isNotNull(),
                    F.concat(anc["heading"], F.lit(" > "), acc["path"]),
                )
                .otherwise(acc["path"])
                .alias("path"),
                F.when(anc.isNotNull(), anc["parent_pos"])
                .otherwise(F.lit(None).cast("int"))
                .alias("cur"),
            )

        init = F.struct(
            h["heading"].alias("path"), h["parent_pos"].alias("cur")
        )
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(max_depth - 1)), init, hop
        )["path"]

    walked = packed.select(
        "url",
        F.explode(
            F.transform(
                F.col("hs"),
                lambda h: F.struct(
                    h["pos"].alias("pos"),
                    h["level"].alias("level"),
                    h["heading"].alias("heading"),
                    breadcrumb(F.col("hs"), h).alias("path"),
                ),
            )
        ).alias("r"),
    )
    return walked.select("url", "r.pos", "r.level", "r.heading", "r.path")
