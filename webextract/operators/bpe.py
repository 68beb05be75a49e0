"""Byte-pair-encoding merge learning over ``documents(doc_id, text)``.

The tokenizer-TRAINING step the vocab module's frequency table feeds:
learn the top-``n_merges`` BPE merges from the corpus (Sennrich et al.
2016, arXiv:1508.07909 — the neural-MT subword algorithm every modern
LLM tokenizer descends from). The reference's analog is its frozen
character dict (ppocr/utils/dict/*.txt, loaded by
ppocr/postprocess/rec_postprocess.py:29-55): a fixed symbol inventory
every decode step indexes into. Here the inventory is LEARNED from the
corpus — the web-scale pipeline builds its tokenizer from the data it
just cleaned.

Distributed shape (the Sennrich trick, kept):
- The corpus is scanned ONCE into a word-frequency table
  (``word_freq``). Everything iterative happens on that table — at
  10^12 pages the distinct-word vocabulary is ~10^7-10^8 rows, so the
  per-merge work is vocabulary-sized, not corpus-sized.
- Each merge round is: adjacent-pair counts (explode + partial-agg
  groupBy — one vocabulary-sized shuffle), a 1-row argmax via
  ``orderBy().limit(1)`` (TakeOrderedAndProject — never a global
  window), and a broadcast of that single row into a JVM higher-order
  ``aggregate`` fold that rewrites each word's symbol string. No
  Python UDFs anywhere; no driver-side pair tables.
- ``localCheckpoint`` truncates lineage each round (the
  links.pagerank pattern) so the plan stays O(1) per round.

Determinism contract (what makes the unrolled recursive-CTE oracle
match bit-for-bit):
- Symbols start as the ``[a-z]`` characters of each ``[a-z]+`` word
  (vocab.WORD_REGEX), joined by single spaces. Symbols therefore never
  contain spaces or regex metacharacters, so plain string matching on
  the space-padded form is symbol-exact.
- Pair counts sum corpus word counts over ALL adjacent positions
  (overlapping: "aaa" contributes 2 to (a,a)) — the same enumeration
  Sennrich's reference ``get_stats`` does.
- The winning pair is max count, ties broken (left, right) ascending.
- Merge application is LEFT-TO-RIGHT GREEDY non-overlapping: Spark
  folds the symbol array with ``F.aggregate``; the oracle iterates a
  first-occurrence ``regexp_replace`` of the padded pattern
  `` l r `` → `` lr `` to fixpoint in a recursive CTE. Both are the
  same function: re-scanning from the string start after a
  first-match replace can never create an earlier match (the replaced
  prefix no longer contains the pattern), so the fixpoint equals the
  single greedy left-to-right pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webextract.operators.vocab import WORD_REGEX

# symbol alphabet: single [a-z] chars (each word's character split).
SYM_REGEX = "[a-z]"


def word_freq(docs: DataFrame) -> DataFrame:
    """(syms, cnt): corpus word frequencies with each word pre-split
    into its space-joined character symbols — the ONE corpus-sized
    scan; every merge iteration runs on this table's ~|V| rows.
    Distinct words have distinct character sequences, and merging
    only ever concatenates adjacent symbols, so ``syms`` stays a key
    through every round."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_REGEX), 0)
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.array_join(
                F.regexp_extract_all(F.col("word"), F.lit(SYM_REGEX), 0), " "
            ).alias("syms"),
            "cnt",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, pair_cnt): adjacent-symbol pair counts weighted by word
    frequency. explode + groupBy partial-combines before its shuffle;
    the pair space is bounded by total symbols in the vocabulary."""
    chars = F.split(F.col("syms"), " ")
    pairs = F.zip_with(
        F.slice(chars, F.lit(1), F.size(chars) - 1),
        F.slice(chars, F.lit(2), F.size(chars) - 1),
        _pair_struct,
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def _pair_struct(a: Column, b: Column) -> Column:
    # closure-free named lambda: PySpark introspects arity, so no
    # default args (oracle-portability rule)
    return F.struct(a.alias("l"), b.alias("r"))


def _apply_merge(vocab: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite every word's symbol string with the winning merge: a
    broadcast join of the 1-row (l, r) argmax, then a JVM
    ``aggregate`` fold over the symbol array — exact left-to-right
    greedy, whole-stage codegen, no shuffle. LEFT join on purpose: if
    the corpus has run out of pairs the argmax is EMPTY, l/r come
    back NULL, every fold condition is NULL→false, and the vocabulary
    passes through unchanged (a cross join would silently erase it)."""
    merged = vocab.join(F.broadcast(best.select("l", "r")), F.lit(True), "left")
    return merged.select(
        F.aggregate(
            F.split(F.col("syms"), " "),
            F.lit(""),
            _fold_step,
        ).alias("syms"),
        "cnt",
    )


def _fold_step(acc: Column, y: Column) -> Column:
    # last symbol of the accumulated string (acc itself when no space)
    last = F.substring_index(acc, " ", -1)
    prefix = F.left(acc, F.length(acc) - F.length(last))
    return (
        F.when(acc == "", y)
        .when(
            (last == F.col("l")) & (y == F.col("r")),
            F.concat(prefix, F.col("l"), F.col("r")),
        )
        .otherwise(F.concat(acc, F.lit(" "), y))
    )


def bpe_learn(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Learn ``n_merges`` BPE merges → (step, left_sym, right_sym,
    merged, pair_cnt), step 1-based in learning order.

    Each round's argmax row is eagerly localCheckpoint-ed (it is ONE
    row) so the output union and the next round's fold both reuse it
    without recomputing the pair aggregation, and the vocabulary is
    checkpointed per round to keep lineage O(1)."""
    vocab = word_freq(docs).localCheckpoint(eager=False)
    steps = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint()
        )
        steps.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                "pair_cnt",
            )
        )
        vocab = _apply_merge(vocab, best).localCheckpoint(eager=False)
    out = steps[0]
    for s in steps[1:]:
        out = out.union(s)
    return out


def _merged_vocab(docs: DataFrame, n_merges: int) -> DataFrame:
    """The word-frequency table after ``n_merges`` learned merges —
    the trained-tokenizer artifact (syms, cnt). Shared by
    :func:`bpe_vocab` (inventory stats) and :func:`bpe_encode`
    (corpus application); at 10^12 pages this table is what a
    deployment persists once and reuses."""
    vocab = word_freq(docs).localCheckpoint(eager=False)
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint()
        )
        vocab = _apply_merge(vocab, best).localCheckpoint(eager=False)
    return vocab


def bpe_vocab(docs: DataFrame, n_merges: int = 8, k: int = 20) -> DataFrame:
    """The symbol inventory AFTER ``n_merges`` learned merges:
    top-``k`` symbols by corpus occurrence → (rank, sym,
    n_occurrences). Evidences merge APPLICATION (the encode side),
    not just learning; rank ties break symbol-ascending and top-k is
    a distributed TakeOrderedAndProject."""
    vocab = _merged_vocab(docs, n_merges)
    totals = (
        vocab.select(F.explode(F.split("syms", " ")).alias("sym"), "cnt")
        .groupBy("sym")
        .agg(F.sum("cnt").alias("n_occurrences"))
    )
    top = totals.orderBy(
        F.desc("n_occurrences"), F.asc("sym")
    ).limit(k)
    from pyspark.sql.window import Window

    w = Window.partitionBy(
        F.coalesce(F.substring(F.col("sym"), 0, 0), F.lit(""))
    ).orderBy(F.desc("n_occurrences"), F.asc("sym"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "sym", "n_occurrences"
    )


def bpe_encode(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Apply the learned tokenizer to the corpus — the encode pass a
    training-data pipeline runs over every document once the merges
    are frozen (the reference analog is the per-image dict lookup in
    ppocr/postprocess/rec_postprocess.py:55-88: a trained inventory
    applied row-by-row at inference). Output per document: word
    count, BPE token count under the ``n_merges``-merge tokenizer,
    and tokens_per_word (one IEEE division of exact ints — the
    hash-portable compression ratio the sampling/packing operators
    consume as a cost signal).

    The word → tokenization mapping needs no second derivation:
    merges only ever concatenate adjacent symbols, so stripping the
    spaces from a merged symbol string recovers the original word —
    the trained vocabulary table IS the mapping.

    Scale shape: the corpus is reduced to (doc_id, word, k) by a
    partial-agg groupBy before touching the vocabulary, so the join
    input is distinct words per document, not word instances; the
    mapping side is vocabulary-sized (~10^7-10^8 at 10^12 pages) and
    joins by word equi-key. Hot words ("the") make (word) a skewed
    join key — the pre-aggregation caps that at one row per
    (document, word), and AQE's skew-join split handles the residual
    imbalance; no window, no collect, no Python."""
    mapping = _merged_vocab(docs, n_merges).select(
        F.replace(F.col("syms"), F.lit(" "), F.lit("")).alias("word"),
        F.size(F.split("syms", " ")).alias("n_syms"),
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_REGEX), 0)
        ).alias("word"),
    )
    per_doc_word = words.groupBy("doc_id", "word").agg(
        F.count("*").alias("k")
    )
    joined = per_doc_word.join(mapping, "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(F.col("k") * F.col("n_syms")).alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_word",
            F.col("n_tokens").cast("double") / F.col("n_words"),
        )
    )
