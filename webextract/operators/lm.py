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
bucket), so the model is **quantized to integer bit-costs** relative
to the reference corpus's own size:

    cost(token) = B − length(bin(count(token))) + 1,
    B = length(bin(Σ counts))

i.e. ``⌈−log2 (count/total)⌉`` up to one bit — ``length(bin(c))`` is
``floor(log2 c)+1`` computed exactly in both engines from the binary
string, never through floating point. Because the constant ``B``
GROWS with the reference corpus, costs stay in ``[1, B]`` at every
scale (the most common token always costs ~1 bit, a hapax ~B bits):
no saturation, no zero/negative costs however large a token's count
gets — a fixed constant (the previous design) goes non-positive once
a count reaches 2^(const−1), which common tokens do long before
10^12 docs. OOV tokens cost ``max(cost)+1``, one bit past the rarest
in-vocabulary token. A document's score is then
``bits_per_kt = (Σ cost · 1000) div n_tokens`` — pure BIGINT
arithmetic, hash-exact vs the oracle by construction.

Buckets are RELATIVE to the corpus mean (head < 85%, tail > 110% —
frozen constants), compared by integer cross-multiplication, so the
same frozen thresholds hold at every scale factor. ``B ≤ 63`` by
construction (counts are BIGINT), so ``bits_per_kt ≤ 64,000`` and the
cross-product ``bpkt·n_docs·100`` stays inside BIGINT up to ~1.4e12
docs; lift the comparison to DECIMAL beyond that.

Scale shape: the LM is a (token, cost) table trained once on the
reference corpus — vocabulary-sized, i.e. tiny next to the crawl —
and **broadcast** into the scoring join (the OOV cost is a one-row
scalar broadcast alongside). Scoring is explode → broadcast-join →
groupBy(doc_id): partial aggregation collapses each doc's tokens
map-side, so the one shuffle moves ~one row per doc. The corpus mean
is a single scalar aggregate broadcast back — no global sort, no
window over one partition (ntile is exactly what NOT to do at 10^12
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_HEAD_PCT = 85  # head: bits_per_kt < 85% of corpus mean
LM_TAIL_PCT = 110  # tail: bits_per_kt > 110% of corpus mean


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token"))


def bit_cost_lm(counts: DataFrame, key_col: str) -> tuple[DataFrame, DataFrame]:
    """THE quantized bit-cost construction (module docstring formula),
    shared by :func:`unigram_lm` and ``importance.bucket_lm`` so the
    load-bearing expression exists exactly once: a ``(key, c)`` count
    table becomes ``((key, cost BIGINT), one-row (total,))`` with
    ``cost = length(bin(total)) − length(bin(c)) + 1``. Callers pass a
    CHECKPOINTED counts table (it feeds the total branch here plus
    whatever the caller derives from either output)."""
    tot = counts.agg(F.sum("c").alias("total"))
    costs = counts.crossJoin(F.broadcast(tot)).select(
        key_col,
        (
            F.length(F.bin("total")) - F.length(F.bin("c")) + F.lit(1)
        ).cast("long").alias("cost"),
    )
    return costs, tot


def unigram_lm(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the quantized unigram model: (token, cost BIGINT).

    ``ref_docs`` is the clean reference corpus (CCNet trains on
    Wikipedia; the driver query freezes ``doc_id % 10 = 0`` as its
    stand-in). One groupBy over the exploded tokens plus a one-row
    total; the result is vocabulary-sized and meant to be broadcast by
    the caller. The count table is checkpointed because it feeds
    THREE plan branches (the total here, the scoring join and the OOV
    scalar in :func:`lm_score`) — without it Catalyst re-runs the
    reference explode+groupBy once per branch (the lsh_pairs lesson).
    """
    counts = (
        _tokens(ref_docs, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    costs, _ = bit_cost_lm(counts, "token")
    return costs


def lm_score(docs: DataFrame, lm: DataFrame, text_col: str = "text") -> DataFrame:
    """Score + bucket every doc: (doc_id, n_tokens, total_bits,
    bits_per_kt, bucket).

    ``bits_per_kt`` is integer millibits-per-token; ``bucket`` compares
    it to the corpus mean by BIGINT cross-multiplication (no division,
    no floats — see module docstring). OOV tokens cost ``max(cost)+1``
    — one bit past the rarest in-vocabulary token. An EMPTY model
    (reference corpus matched nothing) degrades to a defined uniform
    cost of 1 for every token — no signal, every doc scores equal and
    lands 'middle' — instead of NULL scores silently doing the same.
    """
    oov = lm.agg(
        F.coalesce(F.max("cost") + F.lit(1), F.lit(1)).alias("oov_cost")
    )
    scored = (
        _tokens(docs, text_col)
        .join(F.broadcast(lm), "token", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("cost"), F.col("oov_cost"))).alias("total_bits"),
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
