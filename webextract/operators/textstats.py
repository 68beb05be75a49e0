"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table.

The training-data-pipeline companions to extraction: token counting,
quality scoring, language ID, and document fingerprinting. These are
the corpus-level analogs of the reference's recognition postprocess
metrics (char-dict decode + mean confidence, ppocr/postprocess/
rec_postprocess.py:70-100; exact-match / edit-distance metrics,
ppocr/metrics/rec_metric.py:39-78).

Every operator here is 100% JVM-side built-ins (no Python UDFs): the
expressions stay inside whole-stage codegen and the parquet scan reads
only the referenced columns. Each has an exact ANSI-SQL mirror in
``__spark_entry__.py`` (the DuckDB oracle), so all arithmetic is
integer-derived or a single IEEE double division — deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Frozen marker-word tables for the language-ID heuristic (the analog of
# the reference's per-language char dicts, ppocr/utils/dict/*.txt chosen
# by parse_lang at paddleocr.py:356-391). Tiny on purpose: broadcast as
# literals into the plan, not a join.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "que", "pour"),
    "es": ("el", "la", "los", "que", "es", "por", "con"),
    "zh": ("的", "是", "了", "在", "和", "有", "不"),
}
# deterministic precedence for argmax ties (frozen)
LANG_ORDER: tuple[str, ...] = ("en", "de", "fr", "es", "zh")

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "with", "for", "on", "as", "at", "by",
)

# BPE-ish word/number/punct pieces (shared with the oracle SQL verbatim)
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace tokens + BPE-ish regex pieces.

    Mirrors the reference's per-image char-count accounting inside CTC
    decode (rec_postprocess.py:70-100) at corpus scale.
    """
    return docs.select(
        "doc_id",
        F.size(_toks()).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0)).alias(
            "n_pieces"
        ),
        F.length("text").alias("n_chars_obs"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score per doc (the ``drop_score`` analog at
    document granularity, tools/infer/utility.py:104).

    All features derive from integer counts; the only float ops are
    single divisions and one fixed-order linear blend, so the DuckDB
    oracle reproduces values bit-for-bit.
    """
    toks = _toks()
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_alpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    mean_tok_len = (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens.cast(
        "double"
    )
    # NOTE: ratios stay un-rounded: a single IEEE double division of two
    # exact ints is bit-identical across engines, whereas round() is not
    # (HALF_UP vs HALF_EVEN at a terminating 7th decimal).
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        (n_alpha == n_tokens).alias("all_alpha"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID with deterministic argmax.

    The analog of ``parse_lang`` model-family dispatch
    (paddleocr.py:356-391) turned into a data-derived classifier.
    Returns (doc_id, lang, pred_lang, c_<lang>...) — the declared lang,
    the argmax prediction, and the per-language marker counts, so
    corpus agreement (lang = pred_lang) is one aggregation away.
    """
    toks = _toks()

    def marker_count(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    counts = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    # deterministic argmax: first lang in LANG_ORDER achieving the max
    best = counts[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        best = F.greatest(best, counts[lang])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):
        pred = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        *[counts[lang].alias(f"c_{lang}") for lang in LANG_ORDER],
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonical document fingerprint: md5 of the lowercased,
    whitespace-collapsed text (the golden-equality key, the analog of
    the byte-identical text compare in test_tipc/compare_results.py:
    103-140). md5 is portable across Spark and DuckDB."""
    canon = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fp"),
        F.length(canon).alias("canon_len"),
    )
