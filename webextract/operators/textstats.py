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


def repetition_stats(docs: DataFrame, sep: str = ". ") -> DataFrame:
    """Gopher-style repetition signals per doc — the corpus-filter
    rules ("fraction of duplicate lines", "fraction in the most common
    n-gram") used to drop low-quality/boilerplate documents from LLM
    training data.

    Returns (doc_id, n_lines, n_dup_lines, dup_line_frac, n_bigrams,
    max_bigram_cnt, top_bigram_frac). Scale shape: the line signals
    are per-row array ops inside codegen (NO shuffle); the bigram mode
    needs a per-(doc, bigram) count — one explode + two partial-agg
    shuffles on (doc_id, bigram) then doc_id, exactly the word-count
    shape that scales linearly. All fractions are single IEEE
    divisions of exact ints (oracle bit-exact).
    """
    import re

    lines = F.split(F.col("text"), re.escape(sep), -1)
    n_lines = F.size(lines)
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))
    line_side = docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_dup_lines.alias("n_dup_lines"),
        (n_dup_lines.cast("double") / n_lines.cast("double")).alias(
            "dup_line_frac"
        ),
    )
    toks = _toks()
    grams = docs.filter(F.size(toks) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
            )
        ).alias("bigram"),
    )
    per_gram = grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    gram_side = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("max_bigram_cnt"),
    )
    return line_side.join(gram_side, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "n_dup_lines",
        "dup_line_frac",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("max_bigram_cnt", F.lit(0)).alias("max_bigram_cnt"),
        F.when(
            F.col("n_bigrams").isNotNull(),
            F.col("max_bigram_cnt").cast("double")
            / F.col("n_bigrams").cast("double"),
        ).alias("top_bigram_frac"),
    )


# Frozen PII patterns (public regex idioms; mirrored semantics are
# pinned by a ground-truth oracle, not by re-stating the regex)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def redact_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """PII scrub for training data: emails → ``<EMAIL>``, North-
    American-style phone numbers → ``<PHONE>``, with per-doc match
    counts for audit rollups. All codegen — no Python in the path; at
    100 TB this is a map-only stage that fuses into the scan.

    The audit counts are exactly the replacements PERFORMED: emails
    are counted on the raw text, phones on the email-redacted text
    (redaction runs in that order), so a digit run swallowed by an
    email match — ``555-123-4567@host.example`` — is never reported
    as a phone that was not actually replaced. ``regexp_count`` keeps
    counting allocation-free (no match-array materialization)."""
    c = F.col(col)
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE))
    no_emails = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(no_emails, F.lit(PHONE_RE))
    redacted = F.regexp_replace(no_emails, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        redacted.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
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


# Unicode script ranges (BMP, literal chars so the identical pattern
# text runs under both Java regex and DuckDB's RE2). Order is the
# deterministic argmax precedence.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "[A-Za-zÀ-ɏ]",
    "cyrillic": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "arabic": "[؀-ۿ]",
    "hebrew": "[֐-׿]",
    "cjk": "[一-鿿぀-ヿ가-힯]",
}
SCRIPT_ORDER: tuple[str, ...] = tuple(SCRIPT_RANGES)


def script_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-system profile: character counts for six
    Unicode script classes, the dominant script (deterministic argmax
    — first of SCRIPT_ORDER on ties, 'none' when no scripted chars),
    and its share in integer permille (BIGINT ``div`` — no floats, so
    the value is hash-exact vs the oracle at any magnitude).

    The script-level companion of :func:`lang_id` (the reference
    dispatches model families by script before language,
    paddleocr.py:356-391 — latin/arabic/cyrillic groups); counts use
    BMP ranges stated as literal characters so the SAME pattern text
    is exact under Java regex and DuckDB RE2. All codegen
    (`regexp_count`), map-only — no shuffle, no Python.
    """
    c = F.col(text_col)
    counts = {
        s: F.regexp_count(c, F.lit(rx)).cast("long")
        for s, rx in SCRIPT_RANGES.items()
    }
    total = counts[SCRIPT_ORDER[0]]
    for s in SCRIPT_ORDER[1:]:
        total = total + counts[s]
    best = counts[SCRIPT_ORDER[0]]
    for s in SCRIPT_ORDER[1:]:
        best = F.greatest(best, counts[s])
    dom = F.lit("none")
    for s in reversed(SCRIPT_ORDER):
        dom = F.when((best > 0) & (counts[s] == best), F.lit(s)).otherwise(dom)
    return docs.select(
        "doc_id",
        *[counts[s].alias(f"c_{s}") for s in SCRIPT_ORDER],
        total.alias("n_scripted"),
        dom.alias("script"),
        F.when(total > 0, best * F.lit(1000)).otherwise(F.lit(0)).alias("_b"),
    ).select(
        "doc_id",
        *[f"c_{s}" for s in SCRIPT_ORDER],
        "n_scripted",
        "script",
        F.expr("CASE WHEN n_scripted > 0 THEN _b div n_scripted"
               " ELSE 0 END").alias("script_permille"),
    )


# -- Gopher document-level rule filter --------------------------------

# Frozen Gopher rule constants (Rae et al. 2021, "Scaling Language
# Models" §A1.1 — the document-filter recipe most LLM pipelines reuse).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3  # mean word length bounds (chars)
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MAX_SYMBOL_X10 = 1  # symbol-to-word ratio ≤ 0.1 → 10·sym ≤ 1·words
GOPHER_MAX_BULLET_X10 = 9  # ≤ 90% of lines may start with a bullet
GOPHER_MIN_ALPHA_X10 = 8   # ≥ 80% of words must contain a letter
GOPHER_MIN_STOPWORDS = 2   # ≥ 2 distinct stopword hits


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style document filter: the frozen rule battery over
    whitespace words → one boolean per rule + the final keep verdict.
    The composite gate most post-2021 pipelines (Gopher, RefinedWeb,
    Dolma, FineWeb) run between extraction and dedup; reference
    analog: the multi-predicate box sanitize that drops degenerate
    detections (tools/infer/predict_det.py:191-205).

    Every rule compares exact integers (ratios by cross-multiplication
    — never a float), so the verdict table is hash-exact vs the
    oracle. One codegen-only pass: no shuffle, no UDF; at 10^12 docs
    this is a map-only scan that AQE fuses with whatever runs next.

    Rules (constants above; all counts from the text itself):
     - words:     GOPHER_MIN_WORDS ≤ n_words ≤ GOPHER_MAX_WORDS
     - mean_len:  3 ≤ (n_chars − (n_words − 1)) / n_words ≤ 10
     - symbols:   '#' + '…' occurrences ≤ 0.1 · n_words
     - bullets:   lines starting with '-'/'•' ≤ 0.9 · n_lines
     - alpha:     words containing a letter ≥ 0.8 · n_words
     - stopwords: ≥ 2 distinct STOPWORDS present
    """
    toks = _toks()
    n_words = F.size(toks)
    word_chars = F.length("text") - (n_words - F.lit(1))
    n_sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[#…]"), 0)
    )
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike("^[-•]"))
    )
    n_alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    )
    n_stop_distinct = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    )
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mean_len = (
        word_chars >= F.lit(GOPHER_MIN_MEAN_LEN) * n_words
    ) & (word_chars <= F.lit(GOPHER_MAX_MEAN_LEN) * n_words)
    r_symbols = F.lit(10) * n_sym <= F.lit(GOPHER_MAX_SYMBOL_X10) * n_words
    r_bullets = F.lit(10) * n_bullet <= F.lit(GOPHER_MAX_BULLET_X10) * n_lines
    r_alpha = F.lit(10) * n_alpha_words >= F.lit(GOPHER_MIN_ALPHA_X10) * n_words
    r_stopwords = n_stop_distinct >= GOPHER_MIN_STOPWORDS
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        r_words.alias("r_words"),
        r_mean_len.alias("r_mean_len"),
        r_symbols.alias("r_symbols"),
        r_bullets.alias("r_bullets"),
        r_alpha.alias("r_alpha"),
        r_stopwords.alias("r_stopwords"),
    )
    keep = (
        F.col("r_words")
        & F.col("r_mean_len")
        & F.col("r_symbols")
        & F.col("r_bullets")
        & F.col("r_alpha")
        & F.col("r_stopwords")
    )
    return out.withColumn("keep", keep)


def length_quantiles(
    docs: DataFrame, qs: tuple[int, ...] = (500, 900, 990)
) -> DataFrame:
    """EXACT per-language document-length quantiles (permille points,
    default p50/p90/p99) via the count-histogram method — the Gopher-
    style corpus length profile (reference analog: the dataset-wide
    shape statistics PaddleOCR's benchmark harness reports per config,
    benchmark/readme.md).

    Scale shape: the corpus collapses to a (lang, len) count histogram
    at the first shuffle — the running-sum window that follows orders
    DISTINCT LENGTHS within a language (bounded by max document
    length, ~10^5-10^6 rows per language at any corpus size), never
    corpus rows, so the single-task-per-key window trap does not
    apply. The quantile pick is then: smallest length whose cumulative
    count reaches ceil(q·n/1000) — all integer arithmetic, no
    interpolation, hash-portable by construction.
    """
    from pyspark.sql.window import Window

    # byte length (octet_length <-> DuckDB strlen): unambiguous across
    # engines, unlike codepoint/grapheme counting. The histogram feeds
    # two plan branches (running sum + totals): checkpoint so the
    # corpus scan runs once (r2 lesson).
    # NULL texts are excluded, not counted: engines disagree on NULL
    # window placement (Spark orders NULLs first, DuckDB last) and a
    # lengthless doc has no business in a length quantile
    # (review finding)
    lens = (
        docs.filter(F.col("text").isNotNull())
        .groupBy(
            F.col("lang"),
            F.octet_length("text").cast("long").alias("len"),
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lens.withColumn("cum", F.sum("c").over(w))
    tot = lens.groupBy("lang").agg(F.sum("c").alias("n_docs"))
    qcol = F.explode(
        F.array([F.lit(q).cast("long") for q in qs])
    ).alias("q_permille")
    j = cum.join(F.broadcast(tot), "lang").select(
        "lang", "len", "cum", "n_docs", qcol
    )
    # cum >= ceil(q*n/1000)  <=>  cum*1000 >= q*n  (integer cum)
    return (
        j.filter(F.col("cum") * 1000 >= F.col("q_permille") * F.col("n_docs"))
        .groupBy("lang", "q_permille")
        .agg(F.min("len").alias("len"), F.min("n_docs").alias("n_docs"))
    )
