"""DSIR-style hashed-n-gram importance weighting + Naive-Bayes quality
classification — the model-based data-selection stages of an LLM
pipeline, in exact integer arithmetic.

Two published methods share one computation:

* **DSIR** (Xie et al., 2023, "Data Selection for Language Models via
  Importance Resampling") parameterizes both the target and the raw
  distribution as bag-of-hashed-n-gram unigram models and weights
  every raw document by the log-likelihood ratio
  ``log p_target(doc) − log p_raw(doc)``; resampling by that weight
  shifts the crawl toward the target domain.
* The **fastText quality filter** of CCNet / RedPajama / LLaMA is a
  linear classifier over hashed n-gram features whose decision rule,
  for a multinomial Naive-Bayes fit, is the SAME log-ratio with
  labeled positive/negative corpora and a sign threshold.

Both are re-expressed on the engine's quantized-LM core
(:mod:`webextract.operators.lm`): features are word unigrams AND
bigrams (DSIR's parameterization) hashed into ``N_BUCKETS`` buckets
via the engine-portable ``conv(substr(md5(ng),1,8),16,10) %
N_BUCKETS``; each corpus trains a bucket-level integer bit-cost table
``cost(b) = B − len(bin(count(b))) + 1`` (exact ``⌈−log2 p⌉`` up to a
bit, never through floating point — see lm.py's module docstring for
why float ``ln`` is not oracle-portable); a document's bits under a
corpus is the SUM of its feature buckets' costs, with out-of-model
buckets costing ``len(bin(total))+1`` (one bit past a hapax — see
:func:`bucket_lm` for why the two-model comparison grounds OOV in
corpus size rather than lm.py's ``max(cost)+1``). The importance weight / classifier
margin is then the BIGINT difference of two such sums — hash-exact
against a DuckDB restatement by construction.

Reference analog: the learned rec-score keep/drop gate
(``drop_score``, tools/infer/utility.py:104) — a trained scalar score
deciding, per item, whether it survives the pipeline.

Scale shape (10^12 docs): each bucket LM is ≤ ``N_BUCKETS`` rows — a
frozen constant, broadcast into the scoring join; scoring is explode →
two broadcast joins → ``groupBy(doc_id)`` with map-side partial
aggregation, so the ONE shuffle moves ~one row per document. No global
sort, no windows; selection on the output is a distributed top-k
(TakeOrderedAndProject) the registry demonstrates elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from webextract.operators.dedup import shingle_array
from webextract.operators.lm import bit_cost_lm

# DSIR's hashed n-gram dimensionality (Xie et al., 2023 use 10^4
# buckets). Frozen so the broadcast table size is a constant at any
# corpus scale.
N_BUCKETS = 10_000


def hashed_buckets(
    docs: DataFrame, text_col: str = "text", n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Per-occurrence hashed features: (doc_id, bucket BIGINT).

    One row per word unigram AND per word bigram occurrence (a bag,
    not a set — both DSIR and Naive Bayes count multiplicity). The
    bucket id is the engine-portable md5 prefix hash mod
    ``n_buckets``; the whole expression is JVM codegen (the in-row
    gram construction is dedup's :func:`shingle_array`, shared not
    copied). NULL text coalesces to ``''`` (one empty-token feature)
    so no document silently drops out of the feature table.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    feats = F.concat(shingle_array(toks, 1), shingle_array(toks, 2))
    bucket = (
        F.conv(F.substring(F.md5(F.col("ng")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return docs.select("doc_id", F.explode(feats).alias("ng")).select(
        "doc_id", bucket.alias("bucket")
    )


def bucket_lm(feats: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Quantized bucket-level LM over hashed features: a ``(bucket,
    cost BIGINT)`` table (lm.py's integer bit-cost construction
    applied to bucket ids) plus a one-row ``(oov,)`` scalar.

    The OOV cost here is ``B + 1 = len(bin(total)) + 1`` — one bit
    past a HAPAX (a count-1 bucket costs exactly ``B``), NOT lm.py's
    ``max(seen cost) + 1``. The distinction matters precisely when two
    LMs are compared: under max+1, a tight-vocabulary corpus (no rare
    buckets, so ``max(cost)`` is small) prices unseen features
    CHEAPER than a hapax-rich corpus prices its own seen ones, and
    the log-odds flips toward the wrong model. Grounding OOV in the
    corpus SIZE keeps the two sides on the same scale. An empty
    training side degrades to ``oov = 1`` (uniform, signal-free).

    The count table is checkpointed because it feeds both the total
    and the cost projection; the result is ≤ N_BUCKETS rows, meant to
    be broadcast by the caller. The cost construction itself is
    lm.py's :func:`~webextract.operators.lm.bit_cost_lm` — shared,
    not copied, so the load-bearing formula exists once.
    """
    counts = (
        feats.groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    costs, tot = bit_cost_lm(counts, "bucket")
    oov = tot.select(
        (F.coalesce(F.length(F.bin("total")), F.lit(0)) + F.lit(1))
        .cast("long")
        .alias("oov")
    )
    return costs, oov


def log_ratio_scores(
    docs: DataFrame,
    target: DataFrame | None,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    target_pred: Column | None = None,
) -> DataFrame:
    """Per-doc exact-integer log-likelihood ratio of two hashed-n-gram
    LMs: (doc_id, n_feats, bits_target, bits_raw, weight_bits) with
    ``weight_bits = bits_raw − bits_target`` — positive means the doc
    looks MORE like ``target`` than like ``raw`` (bits are negated
    log-probs, so the cheap side is the likely side).

    Out-of-model buckets cost ``len(bin(total))+1`` under that LM —
    one bit past a hapax, see :func:`bucket_lm` for why two-model
    comparison needs size-grounded (not vocabulary-shaped) OOV; an
    EMPTY training side degrades to uniform cost 1 (defined,
    signal-free) rather than NULL scores.
    Every doc has ≥1 feature (``split`` of an empty string yields one
    empty token, and NULL text coalesces to empty), so no doc silently
    drops out of the weight table.

    When the target distribution is a SLICE of ``docs`` (the usual
    DSIR shape: a clean-reference subset of the crawl being scored),
    pass ``target_pred`` — a predicate over ``doc_id`` — instead of a
    ``target`` DataFrame: the target LM then trains on a filter of the
    already-computed corpus features, so the corpus is tokenized and
    hashed ONCE (at 10^12 docs a separate ``target`` DataFrame would
    repeat the explode+md5 over the whole slice).
    """
    feats = hashed_buckets(docs, text_col, n_buckets)
    if raw is docs or target_pred is not None:
        # the DSIR shape (raw distribution = the scored corpus): the
        # feature explode feeds the raw LM, the scoring join, and
        # (under target_pred) the target LM — checkpoint it once
        # instead of letting Catalyst re-run the explode per branch
        # (the lsh_pairs lesson)
        feats = feats.localCheckpoint(eager=False)
    raw_feats = (
        feats if raw is docs else hashed_buckets(raw, text_col, n_buckets)
    )
    if target_pred is not None:
        t_feats = feats.filter(target_pred)
    else:
        if target is None:
            raise ValueError("pass target or target_pred")
        t_feats = hashed_buckets(target, text_col, n_buckets)
    lm_t, oov_t = bucket_lm(t_feats)
    lm_r, oov_r = bucket_lm(raw_feats)
    lm_t = lm_t.withColumnRenamed("cost", "cost_t")
    lm_r = lm_r.withColumnRenamed("cost", "cost_r")
    oov_t = oov_t.withColumnRenamed("oov", "oov_t")
    oov_r = oov_r.withColumnRenamed("oov", "oov_r")
    return (
        feats.join(F.broadcast(lm_t), "bucket", "left")
        .join(F.broadcast(lm_r), "bucket", "left")
        .crossJoin(F.broadcast(oov_t))
        .crossJoin(F.broadcast(oov_r))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(F.coalesce("cost_t", "oov_t")).alias("bits_target"),
            F.sum(F.coalesce("cost_r", "oov_r")).alias("bits_raw"),
        )
        .withColumn("weight_bits", F.col("bits_raw") - F.col("bits_target"))
    )


def nb_classify(
    docs: DataFrame,
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    margin_bits: int = 0,
) -> DataFrame:
    """Naive-Bayes keep/drop classification: (doc_id, n_feats,
    bits_pos, bits_neg, score_bits, label) with ``label = 'keep'``
    when ``score_bits = bits_neg − bits_pos > margin_bits`` (the doc
    is cheaper — more likely — under the positive LM by more than the
    margin). ``margin_bits`` shifts the decision boundary the way the
    fastText filters threshold their keep probability.
    """
    scored = log_ratio_scores(docs, pos, neg, text_col, n_buckets)
    return scored.select(
        "doc_id",
        "n_feats",
        F.col("bits_target").alias("bits_pos"),
        F.col("bits_raw").alias("bits_neg"),
        F.col("weight_bits").alias("score_bits"),
        F.when(F.col("weight_bits") > margin_bits, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
