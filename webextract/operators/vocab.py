"""Corpus vocabulary / indexing / relevance operators over
``documents(doc_id, text, ...)``.

The LLM-training-data companions to textstats: corpus-level word
frequency (the tokenizer-vocabulary build step), an inverted index
(posting lists for corpus search/inspection), per-document TF-IDF
keywords, and a C4-style blocklist gate. The corpus-frequency table is
the web-scale analog of the reference's character-dict construction —
the frozen token inventory every downstream decode step indexes into
(ppocr/postprocess/rec_postprocess.py:29-55 loads the dict;
ppocr/utils/dict/*.txt are its artifacts) — rebuilt here from the
corpus itself, the way a BPE/unigram tokenizer's vocab is cut from a
frequency table.

Every operator is 100% JVM built-ins (no Python UDFs) and every float
ordering is replaced by exact-integer ordering (the quantized-idf
trick, same rationale as lm.py's integer bit costs): ranks are
hash-portable to the DuckDB oracle where raw ln()-based scores are
not.

Scale notes (10^12 docs):
- word-grid aggregations partial-combine before their shuffle
  (groupBy word / (doc_id, word) — plan-asserted partial aggs);
- posting lists are capped BEFORE collection via a per-word
  row_number window (Spark 4 inserts WindowGroupLimit, so the sort
  prunes early) — never an unbounded collect_set that a stopword
  would explode;
- the doc-frequency table joins back to the grid on ``word`` — an
  equi-shuffle both sides; the corpus size N enters as a 1-row
  broadcast aggregate, never a driver-side ``count()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# lowercase-alpha word pieces (mirrored verbatim in the oracle SQL)
WORD_REGEX = "[a-z]+"

# Frozen C4-style blocklist (the "bad words" gate: C4 dropped any doc
# containing a blocklisted token — arxiv:1910.10683 §2.2). Tiny on
# purpose: broadcast as literals into the plan, not a join.
BLOCKLIST: tuple[str, ...] = ("dup", "spam", "casino")

# idf quantization: idf_milli = (1000 * n_docs) DIV df — exact integer
# division in BOTH engines (Spark `DIV`, DuckDB `//`), so rank order is
# bit-portable where tf * ln(N/df) doubles are not.
IDF_SCALE = 1000


def _words(col: str = "text") -> Column:
    return F.regexp_extract_all(F.lower(F.col(col)), F.lit(WORD_REGEX), 0)


def word_grid(docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf) — per-document term frequencies; ONE shuffle
    with map-side partial counts. The base relation every operator
    below derives from."""
    return (
        docs.select("doc_id", F.explode(_words()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )


def _ranked_topk(totals, key_col: str, k: int):
    """Distributed top-k + rank: orderBy+limit compiles to
    TakeOrderedAndProject (never a global window over the full table);
    rank is then a row_number over the ≤k survivors, whose window key
    is a column-DERIVED constant (``coalesce(substring(col,0,0),'')``)
    because a literal partition key constant-folds away and Spark
    re-warns about a partitionless window."""
    order = [F.col("n_occurrences").desc(), F.col(key_col).asc()]
    top = totals.orderBy(*order).limit(k)
    w = Window.partitionBy(
        F.coalesce(F.substring(F.col(key_col), 0, 0), F.lit(""))
    ).orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", key_col, "n_occurrences", "n_docs"
    )


def vocab_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus vocabulary: top-k words by total occurrences with doc
    frequencies — the frequency table a BPE/unigram vocab cut reads.

    Two-level aggregation — (doc_id, word) grid first, then word — so
    both shuffles partial-combine; top-k is a distributed
    TakeOrderedAndProject (never a global window over the full
    vocabulary), rank added over the ≤k survivors.
    """
    totals = word_grid(docs).groupBy("word").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )
    return _ranked_topk(totals, "word", k)


def inverted_index(docs: DataFrame, postings_cap: int = 16) -> DataFrame:
    """(word, df, postings) — posting lists capped at the
    ``postings_cap`` SMALLEST doc_ids per word (deterministic), plus
    the exact doc frequency.

    The cap is applied with a per-word row_number BEFORE any list is
    materialized, so a stopword with 10^9 postings never passes
    through an aggregation buffer — Spark 4 rewrites the
    rank-then-filter into partial/final WindowGroupLimit, pruning at
    the map side. df comes from the same grid via a second partial
    agg, joined back on ``word``.
    """
    grid = word_grid(docs)
    df_tbl = grid.groupBy("word").agg(F.count("*").alias("df"))
    w = Window.partitionBy("word").orderBy(F.col("doc_id").asc())
    capped = (
        grid.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= postings_cap)
        .groupBy("word")
        .agg(
            F.concat_ws(
                ",", F.transform(F.sort_array(F.collect_list("doc_id")), lambda d: d.cast("string"))
            ).alias("postings")
        )
    )
    return df_tbl.join(capped, "word").select("word", "df", "postings")


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k keywords by quantized TF-IDF:
    ``score = tf * ((IDF_SCALE * n_docs) DIV df)`` — exact integers,
    so the rank order hash-matches the oracle (a raw ``ln`` double
    would not; same integer-quantization rationale as lm.py's bit
    costs). Ties break on word.

    Returns (doc_id, rank, word, tf, df). n_docs is a 1-row broadcast
    aggregate (no driver count); the df join is an equi-shuffle on
    ``word``; the final top-k-per-doc window prunes early via
    WindowGroupLimit.
    """
    grid = word_grid(docs)
    df_tbl = grid.groupBy("word").agg(F.count("*").alias("df"))
    n_tbl = F.broadcast(docs.agg(F.count("*").alias("n_docs")))
    scored = (
        grid.join(df_tbl, "word")
        .crossJoin(n_tbl)
        .withColumn(
            "score",
            F.col("tf").cast("decimal(38,0)")
            * F.expr(f"({IDF_SCALE} * n_docs) DIV df").cast("decimal(38,0)"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "word", "tf", "df")
    )


def blocklist_filter(
    docs: DataFrame, blockwords: tuple[str, ...] = BLOCKLIST
) -> DataFrame:
    """C4-style blocklist gate: per doc, the count of blocklisted
    token occurrences (token-exact after lowercasing, not substring —
    'duplicate' does not trip 'dup') and the keep verdict. One
    codegen-only pass, no shuffle at all."""
    words = tuple(blockwords)
    hits = F.filter(_words(), lambda t: t.isin(*words))
    return docs.select(
        "doc_id",
        F.size(hits).alias("n_blocked"),
        (F.size(hits) == 0).alias("keep"),
    )


def ngram_counts(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus word-n-gram statistics: top-k n-grams by total
    occurrences with doc frequencies — the count table an n-gram LM
    (or a contamination/memorization audit) reads. Generalizes
    :func:`vocab_topk` (n=1 on split tokens) to phrases; unlike
    ``dedup.shingles`` the grams are NOT per-doc-distinct — counts are
    occurrence totals, the LM quantity.

    Shape: the gram array is built in-row (``transform`` over
    ``sequence`` — codegen), then the same two-level aggregation as
    the vocabulary build: (doc_id, gram) grid with map-side partial
    counts, then gram totals + doc frequencies, then a distributed
    TakeOrderedAndProject for the top-k (never a global sort).
    """
    from webextract.operators.dedup import shingle_array

    grams = shingle_array(_words(), n)
    grid = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("tf"))
    )
    totals = grid.groupBy("gram").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )
    return _ranked_topk(totals, "gram", k)


# -- BM25 ranked retrieval -------------------------------------------

# Frozen benchmark query set: terms drawn from the synthetic corpus
# vocabulary so every query has real postings at fixture scale.
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("hash", "join")),
    (2, ("window", "sort", "merge")),
    (3, ("stream", "vector", "group")),
)
# score quantization: term scores are integer micropoints — large
# enough that the DIV floor never collapses distinct BM25 values that
# differ by more than ~1e-6 of a point.
BM25_SCALE = 1_000_000
BM25_TOPK = 10


def bm25_search(
    docs: DataFrame,
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> DataFrame:
    """BM25 ranked retrieval over ``documents``: for each benchmark
    query, the top-``k`` documents by an integer-quantized BM25 score
    → (query_id, rank, doc_id, score). The retrieval stage the
    vocabulary / inverted-index / tf-idf family has been building
    toward — the corpus-inspection search a data curator runs ("show
    me the documents this term set actually retrieves"). Reference
    analog: the rec-score ranking that orders candidate boxes before
    the keep-gate (tools/infer/utility.py:104).

    Engine-portable scoring (the reason no float appears): with
    k1 = 1.2 and b = 0.75, the classic per-term score

        idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    is multiplied through by ``10·total_dl`` (avgdl = total_dl/n_docs
    stays a ratio of exact integers, never a rounded double):

        term_score = (SCALE · idf_bits · 22 · tf · total_dl)
                 DIV (10·tf·total_dl + 3·total_dl + 9·dl·n_docs)

    — one integral division of exact DECIMAL(38,0) products, identical
    in Spark and the DuckDB oracle (HUGEINT). ``idf_bits`` is lm.py's
    scale-free quantized log: ``len(bin(n_docs)) − len(bin(df)) + 1``
    ≈ ⌈log2(N/df)⌉ ∈ [1, 64] at any corpus size. The magnitudes
    bound the products: SCALE(1e6) · 64 · 22 · tf(≤1e4) · total_dl
    (1e15 at 10^12 docs ·1k words) ≈ 1e28 < 10^38 — inside
    DECIMAL(38,0)/HUGEINT exactly; the DIV result ≤ SCALE·2.2·64
    fits comfortably in BIGINT, as does any query's term-score sum.

    Scale shape (10^12 docs): the query-term filter is a literal
    ``isin`` pushed into the scan — only postings of query terms ever
    reach a shuffle. The (doc, word) grid partial-combines map-side
    and is checkpointed once (it feeds the df branch AND the scoring
    branch). df and corpus stats are query-vocabulary-sized /
    one-row broadcasts. The final per-query top-k is the
    rank-then-filter pattern Spark 4 rewrites into partial/final
    WindowGroupLimit — map-side pruning, never a global sort.
    """
    spark = docs.sparkSession
    qlist = [(qid, w) for qid, ws in queries for w in ws]
    qterms = F.broadcast(
        spark.createDataFrame(qlist, "query_id INT, word STRING")
    )
    qwords = sorted({w for _, w in qlist})

    toks = docs.select("doc_id", _words().alias("words"))
    grid = (
        toks.select(
            "doc_id",
            F.size("words").alias("dl"),
            F.explode("words").alias("word"),
        )
        .filter(F.col("word").isin(*qwords))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .localCheckpoint(eager=False)
    )
    df_tbl = F.broadcast(grid.groupBy("word").agg(F.count("*").alias("df")))
    stats = F.broadcast(
        docs.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_words())).cast("long").alias("total_dl"),
        )
    )

    dec = "DECIMAL(38,0)"
    term_score = F.expr(
        f"""(CAST({BM25_SCALE} AS {dec}) * CAST(idf_bits AS {dec})
             * CAST(22 AS {dec}) * CAST(tf AS {dec})
             * CAST(total_dl AS {dec}))
            DIV
            (CAST(10 AS {dec}) * CAST(tf AS {dec}) * CAST(total_dl AS {dec})
             + CAST(3 AS {dec}) * CAST(total_dl AS {dec})
             + CAST(9 AS {dec}) * CAST(dl AS {dec}) * CAST(n_docs AS {dec}))"""
    ).cast("long")
    scored = (
        grid.join(qterms, "word")
        .join(df_tbl, "word")
        .crossJoin(stats)
        .withColumn(
            "idf_bits",
            F.length(F.bin("n_docs")) - F.length(F.bin("df")) + F.lit(1),
        )
        .withColumn("term_score", term_score)
    )
    doc_scores = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def phrase_search(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact word-level phrase matching via positional postings — the
    retrieval counterpart of :func:`inverted_index` (which stores
    docs-per-word; phrase queries additionally need word positions,
    the classic positional-index design). Output per matching doc:
    ``n_matches`` (occurrences, overlapping allowed) and ``first_pos``
    (1-based word index of the earliest match).

    Scale shape: the positions table is corpus-sized, but the
    ``isin(terms)`` filter runs INSIDE the explode stage (no shuffle —
    only rows carrying query terms survive to any exchange), and each
    adjacency step is an equi-join on (doc_id, position), a perfectly
    spread key even for stopword-hot terms. The filtered positions
    table feeds every join branch, so it is checkpointed once. At
    10^12 docs the same plan runs against a PERSISTED positions table
    (write ``words`` bucketed by doc_id) — the query-time joins are
    then co-partitioned and exchange-free.
    """
    import re

    # tokenize the QUERY with the same regex as the corpus — a naive
    # .split() would keep punctuation/digit-bearing terms the corpus
    # side can never produce and silently return zero matches
    # (review finding)
    terms = re.findall(WORD_REGEX, phrase.lower())
    assert terms, "phrase must contain at least one [a-z]+ word"
    words = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_REGEX), 0
                )
            ).alias("pos", "word"),
        )
        .filter(F.col("word").isin(terms))
        .localCheckpoint(eager=False)
    )
    base = words.filter(F.col("word") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = words.filter(F.col("word") == t).select(
            F.col("doc_id").alias("d2"), (F.col("pos") - i).alias("p2")
        )
        base = base.join(
            nxt,
            (F.col("doc_id") == F.col("d2")) & (F.col("pos") == F.col("p2")),
        ).select("doc_id", "pos")
    return base.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        (F.min("pos") + 1).cast("long").alias("first_pos"),
    )
