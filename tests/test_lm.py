"""Quantized unigram-LM scoring: cost table, OOV, bucket geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract.operators.lm import LM_MAX_BITS, lm_score, unigram_lm


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_costs_are_floor_log2(spark):
    # token counts 1,2,4,8 → costs 31,30,29,28 (32 - floor(log2 c) - 1)
    ref = _df(
        spark,
        [(0, "a " * 1 + "b " * 2 + "c " * 4 + "d " * 8 + "z")],
    )
    lm = {r.token: r.cost for r in unigram_lm(ref).collect()}
    assert (lm["a"], lm["b"], lm["c"], lm["d"]) == (31, 30, 29, 28)


def test_oov_costs_max_bits(spark):
    ref = _df(spark, [(0, "known known")])
    docs = _df(spark, [(1, "unseen unseen unseen")])
    row = lm_score(docs, unigram_lm(ref)).collect()[0]
    assert row.total_bits == 3 * LM_MAX_BITS
    assert row.bits_per_kt == LM_MAX_BITS * 1000


def test_buckets_relative_to_corpus_mean(spark):
    # head: one token with count 1000 (cost 22 → 22000 bits/kt);
    # middle: a pool shared by 8 docs (count 8 → cost 28 → 28000);
    # tail: all-OOV (32000). mean 27800 → ratios .79 / 1.007 / 1.151.
    mid = " ".join(f"p{j}" for j in range(63))
    docs = _df(
        spark,
        [(0, ("w " * 999) + "w")]
        + [(i, mid) for i in range(1, 9)]
        + [(9, "totally unseen gibberish qqq")],
    )
    ref = docs.filter(F.col("doc_id") < 9)
    out = {r.doc_id: r.bucket for r in lm_score(docs, unigram_lm(ref)).collect()}
    assert out[0] == "head"
    assert out[9] == "tail"
    assert set(out[i] for i in range(1, 9)) == {"middle"}


def test_score_plan_broadcasts_lm(spark):
    ref = _df(spark, [(0, "a b c")])
    plan = lm_score(_df(spark, [(1, "a b x")]), unigram_lm(ref))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
