"""Quantized unigram-LM scoring: cost table, OOV, bucket geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from webextract.operators.lm import lm_score, unigram_lm


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_costs_are_corpus_relative(spark):
    # total = 16 tokens → B = len(bin(16)) = 5; token counts 1,2,4,8
    # → costs 5,4,3,2 (B - floor(log2 c))
    ref = _df(
        spark,
        [(0, "a " * 1 + "b " * 2 + "c " * 4 + "d " * 8 + "z")],
    )
    lm = {r.token: r.cost for r in unigram_lm(ref).collect()}
    assert (lm["a"], lm["b"], lm["c"], lm["d"]) == (5, 4, 3, 2)


def test_unigram_costs_scale_free(spark):
    # the SAME relative frequencies at 64x the corpus size give the
    # SAME costs — the constant grows with the corpus (no saturation)
    ref = _df(
        spark,
        [(0, ("a " * 64 + "b " * 128 + "c " * 256 + "d " * 512).strip() + " " + "z " * 64)],
    )
    lm = {r.token: r.cost for r in unigram_lm(ref).collect()}
    assert (lm["a"], lm["b"], lm["c"], lm["d"]) == (5, 4, 3, 2)


def test_oov_costs_one_past_rarest(spark):
    # ref "known known": total 2, B = 2, cost(known) = 1, OOV = 2
    ref = _df(spark, [(0, "known known")])
    docs = _df(spark, [(1, "unseen unseen unseen")])
    row = lm_score(docs, unigram_lm(ref)).collect()[0]
    assert row.total_bits == 3 * 2
    assert row.bits_per_kt == 2 * 1000


def test_buckets_relative_to_corpus_mean(spark):
    # ref total = 1504 tokens → B = 11.
    # head: one token with count 1000 (cost 2 → 2000 bits/kt);
    # middle: a pool shared by 8 docs (count 8 → cost 8 → 8000);
    # tail: all-OOV (max+1 = 12 → 12000). mean 7800 → .26 / 1.03 / 1.54.
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


def test_empty_reference_degrades_to_uniform_middle(spark):
    # a reference filter matching nothing must yield DEFINED scores
    # (uniform cost 1), not NULLs silently bucketed 'middle'
    ref = _df(spark, []).filter("doc_id < 0")
    docs = _df(spark, [(1, "some words here"), (2, "other text")])
    rows = lm_score(docs, unigram_lm(ref)).collect()
    assert {r.bucket for r in rows} == {"middle"}
    assert all(r.total_bits == r.n_tokens for r in rows)  # cost 1 each
