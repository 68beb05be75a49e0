"""CCNet-style unigram-LM quality bucketing (head / middle / tail).

CCNet (Wenzek et al., 2020) scores every document with a language-model
perplexity trained on a clean reference corpus and splits the crawl
into head/middle/tail buckets; RefinedWeb and most LLM data pipelines
keep this stage. The reference's analog is the rec-score gate
(``drop_score``, tools/infer/utility.py:104): a learned per-item score
deciding keep/demote.

Engine-portability design (the reason this file exists instead of a
float ``ln()``): a float log-prob sum is NOT bit-stable across engines
(ulp differences between Java's and DuckDB's ``ln`` could flip a
bucket), so the model is **quantized to integer bit-costs**:

    cost(token) = LM_MAX_BITS − length(bin(count(token)))

i.e. ``⌈-log2 p⌉`` up to a constant — ``length(bin(c))`` is
``floor(log2 c)+1`` computed exactly in both engines from the binary
string, never through floating point. A document's score is then
``bits_per_kt = (Σ cost · 1000) div n_tokens`` — pure BIGINT
arithmetic, hash-exact vs the oracle by construction.

Buckets are RELATIVE to the corpus mean (head < 85%, tail > 110% —
frozen constants), compared by integer cross-multiplication, so the
same frozen thresholds hold at every scale factor: absolute costs
shrink as the reference corpus grows (counts rise with corpus size),
but the head/middle/tail geometry is scale-free. At 10^12 docs the
cross-product ``bpkt·N·100`` peaks near 3.2e18 — inside BIGINT.

Scale shape: the LM is a (token, cost) table trained once on the
reference corpus — vocabulary-sized, i.e. tiny next to the crawl —
and **broadcast** into the scoring join. Scoring is explode →
broadcast-join → groupBy(doc_id): partial aggregation collapses each
doc's tokens map-side, so the one shuffle moves ~one row per doc.
The corpus mean is a single scalar aggregate broadcast back — no
global sort, no window over one partition (ntile is exactly what NOT
to do at 10^12 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_MAX_BITS = 32  # OOV cost; token costs are LM_MAX_BITS - floor(log2 c) - 1
LM_HEAD_PCT = 85  # head: bits_per_kt < 85% of corpus mean
LM_TAIL_PCT = 110  # tail: bits_per_kt > 110% of corpus mean


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token"))


def unigram_lm(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the quantized unigram model: (token, cost BIGINT).

    ``ref_docs`` is the clean reference corpus (CCNet trains on
    Wikipedia; the driver query freezes ``doc_id % 10 = 0`` as its
    stand-in). One groupBy over the exploded tokens; the result is
    vocabulary-sized and meant to be broadcast by the caller.
    """
    return (
        _tokens(ref_docs, text_col)
        .groupBy("token")
        .agg((F.lit(LM_MAX_BITS) - F.length(F.bin(F.count("*")))).alias("cost"))
    )


def lm_score(docs: DataFrame, lm: DataFrame, text_col: str = "text") -> DataFrame:
    """Score + bucket every doc: (doc_id, n_tokens, total_bits,
    bits_per_kt, bucket).

    ``bits_per_kt`` is integer millibits-per-token; ``bucket`` compares
    it to the corpus mean by BIGINT cross-multiplication (no division,
    no floats — see module docstring). OOV tokens cost LM_MAX_BITS.
    """
    scored = (
        _tokens(docs, text_col)
        .join(F.broadcast(lm), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("cost", F.lit(LM_MAX_BITS))).alias("total_bits"),
        )
        .withColumn("bits_per_kt", F.expr("total_bits * 1000 div n_tokens"))
    )
    corpus = scored.agg(
        F.sum("bits_per_kt").alias("sum_bpkt"), F.count("*").alias("n_docs")
    )
    return (
        scored.crossJoin(F.broadcast(corpus))
        .withColumn(
            "bucket",
            F.when(
                F.col("bits_per_kt") * F.col("n_docs") * 100
                < F.lit(LM_HEAD_PCT) * F.col("sum_bpkt"),
                F.lit("head"),
            )
            .when(
                F.col("bits_per_kt") * F.col("n_docs") * 100
                > F.lit(LM_TAIL_PCT) * F.col("sum_bpkt"),
                F.lit("tail"),
            )
            .otherwise(F.lit("middle")),
        )
        .select("doc_id", "n_tokens", "total_bits", "bits_per_kt", "bucket")
    )
