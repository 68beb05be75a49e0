"""DSIR hashed-n-gram importance weights + NB quality classifier:
feature hashing parity, bit-cost geometry, planted-regime separation,
and the broadcast/no-Python plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from webextract.operators.importance import (
    N_BUCKETS,
    bucket_lm,
    hashed_buckets,
    log_ratio_scores,
    nb_classify,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_buckets(text: str, n_buckets: int = N_BUCKETS) -> list[int]:
    toks = text.split(" ")
    ngrams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(ng.encode()).hexdigest()[:8], 16) % n_buckets
        for ng in ngrams
    ]


def test_hashed_buckets_match_pure_python(spark):
    text = "the quick brown fox jumps over the lazy dog"
    got = sorted(
        r.bucket for r in hashed_buckets(_df(spark, [(0, text)])).collect()
    )
    assert got == sorted(_py_buckets(text))


def test_single_token_doc_has_no_bigrams(spark):
    rows = hashed_buckets(_df(spark, [(0, "solo")])).collect()
    assert len(rows) == 1
    assert rows[0].bucket == _py_buckets("solo")[0]


def test_bucket_lm_costs_are_corpus_relative(spark):
    # same geometry as lm.py's token costs, but over bucket ids:
    # counts 1,2,4,8 in a 16-feature corpus -> costs 5,4,3,2
    feats = spark.createDataFrame(
        [(0, b) for b in [1] * 1 + [2] * 2 + [3] * 4 + [4] * 8 + [5]],
        "doc_id long, bucket long",
    )
    costs, oov = bucket_lm(feats)
    lm = {r.bucket: r.cost for r in costs.collect()}
    assert (lm[1], lm[2], lm[3], lm[4]) == (5, 4, 3, 2)
    # OOV is size-grounded: one bit past a hapax (hapax costs B=5)
    assert oov.collect()[0].oov == 6


def test_oov_beats_tight_vocabulary_trap(spark):
    # a tight-vocabulary corpus (every bucket count 8, no hapaxes)
    # must NOT price unseen features cheaper than a hapax-rich corpus
    # prices its own seen ones: OOV depends on corpus SIZE, not on the
    # rarest seen bucket (max(cost)+1 would give 3 here)
    tight = spark.createDataFrame(
        [(0, b) for b in [1, 2] * 8], "doc_id long, bucket long"
    )
    _, oov = bucket_lm(tight)
    assert oov.collect()[0].oov == 6  # len(bin(16)) + 1


def test_weight_sign_separates_target_like_docs(spark):
    # target corpus speaks "aa bb", raw corpus speaks "xx yy"; a doc in
    # target dialect gets positive weight, raw dialect negative
    target = _df(spark, [(i, "aa bb aa bb") for i in range(4)])
    raw = _df(spark, [(10 + i, "xx yy xx yy") for i in range(4)])
    docs = _df(spark, [(100, "aa bb aa"), (101, "xx yy xx")])
    w = {r.doc_id: r.weight_bits for r in
         log_ratio_scores(docs, target, raw).collect()}
    assert w[100] > 0 and w[101] < 0


def test_weight_bits_is_exact_bit_difference(spark):
    # one doc, one feature occurrence per corpus appearance: hand-check
    # bits. target = {"t"}: B=1, cost(t)=1, oov=2. raw = {"r"}: cost(r)
    # =1, oov=2. doc "t": bits_target=1, bits_raw=2 -> weight +1.
    target = _df(spark, [(0, "t")])
    raw = _df(spark, [(1, "r")])
    row = log_ratio_scores(_df(spark, [(2, "t")]), target, raw).collect()[0]
    assert (row.n_feats, row.bits_target, row.bits_raw, row.weight_bits) == (
        1, 1, 2, 1,
    )


def test_every_doc_scored_even_empty_text(spark):
    # split('') -> [''] -> one unigram feature; no doc drops out
    out = log_ratio_scores(
        _df(spark, [(0, ""), (1, "a b")]),
        _df(spark, [(2, "a b")]),
        _df(spark, [(3, "z")]),
    ).collect()
    assert {r.doc_id for r in out} == {0, 1}
    assert {r.doc_id: r.n_feats for r in out} == {0: 1, 1: 3}


def test_nb_classify_planted_regimes(spark):
    # natural docs share a vocabulary; gibberish docs are per-doc
    # unique tokens. Train pos on natural, neg on gibberish; every
    # held-out doc must land on its planted side.
    natural = [
        (i, "the cat sat on the mat and the dog slept") for i in range(8)
    ]
    # gibberish draws from a SHARED 40-token pool so held-out gibberish
    # is in-model for the negative LM (pure per-doc-unique tokens would
    # sit at score 0 — OOV under both sides — where a single hash
    # collision decides the label)
    gibber = [
        (100 + i, " ".join(f"g{(i * 7 + j) % 40}" for j in range(10)))
        for i in range(8)
    ]
    docs = _df(spark, natural + gibber)
    pos = _df(spark, natural[:4])
    neg = _df(spark, [r for r in gibber[:4]])
    out = nb_classify(docs, pos, neg).collect()
    labels = {r.doc_id: r.label for r in out}
    assert all(labels[i] == "keep" for i, _ in natural)
    assert all(labels[i] == "drop" for i, _ in gibber)
    # score_bits is the published log-odds: bits_neg - bits_pos
    assert all(r.score_bits == r.bits_neg - r.bits_pos for r in out)


def test_plan_broadcasts_lms_and_stays_jvm(spark):
    docs = _df(spark, [(i, "a b c") for i in range(8)])
    plan = log_ratio_scores(
        docs, docs.filter(F.col("doc_id") % 2 == 0), docs
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation collapses features map-side before the one
    # doc_id shuffle — assert the partial-mode functions specifically
    # (bare 'HashAggregate' is true of ANY aggregate plan)
    assert "partial_count" in plan and "partial_sum" in plan


def test_target_pred_matches_explicit_target_slice(spark):
    # the target_pred path (target LM trained on a FILTER of the one
    # corpus feature explode) must score identically to passing the
    # same slice as a separate target DataFrame
    docs = _df(
        spark,
        [(i, f"w{i % 5} common tail t{i % 3}") for i in range(12)],
    )
    pred = F.col("doc_id") % 4 == 0
    via_pred = log_ratio_scores(docs, None, docs, target_pred=pred)
    via_df = log_ratio_scores(docs, docs.filter(pred), docs)
    assert sorted(map(tuple, via_pred.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_null_text_doc_still_scored(spark):
    # the documented invariant: NO doc drops out of the weight table,
    # NULL text included (coalesced to the one empty-token feature)
    docs = _df(spark, [(0, "a b"), (1, None)])
    out = log_ratio_scores(docs, docs, docs).collect()
    assert {r.doc_id for r in out} == {0, 1}
    assert next(r.n_feats for r in out if r.doc_id == 1) == 1
