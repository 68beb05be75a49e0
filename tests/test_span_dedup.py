"""Cross-doc span removal: marking, merging, rebuild, determinism."""

from __future__ import annotations

from webextract.operators.dedup import span_dedup

SHARED = "this work is licensed under a creative commons attribution license for all"


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in span_dedup(docs, **kw).collect()}


def test_shared_tail_removed_everywhere(spark):
    out = _run(
        spark,
        [
            (0, "unique zero text body here " + SHARED),
            (1, "different one content words " + SHARED),
            (2, "totally unrelated text with no duplication at all in it"),
            (3, SHARED + " trailing unique three stuff"),
        ],
    )
    assert out[0].clean_text == "unique zero text body here"
    assert out[1].clean_text == "different one content words"
    assert out[3].clean_text == "trailing unique three stuff"
    assert out[0].n_spans == 1 and out[0].n_removed == 12
    assert out[2].n_spans == 0 and out[2].n_removed == 0
    # untouched doc round-trips byte-identically
    assert out[2].clean_text == "totally unrelated text with no duplication at all in it"


def test_within_doc_repetition_is_not_cross_doc(spark):
    rep = " ".join(["alpha beta gamma delta epsilon zeta eta theta"] * 3)
    out = _run(spark, [(0, rep), (1, "entirely different words in this one doc")])
    assert out[0].n_spans == 0  # df counts DISTINCT docs


def test_long_shared_region_merges_to_one_span(spark):
    long_shared = " ".join(f"tok{i}" for i in range(40))
    out = _run(
        spark,
        [(0, "aa bb " + long_shared + " zz"), (1, long_shared + " qq rr ss tt")],
    )
    assert out[0].n_spans == 1 and out[0].n_removed == 40
    assert out[0].clean_text == "aa bb zz"
    assert out[1].clean_text == "qq rr ss tt"


def test_doc_fully_removed_yields_empty_text(spark):
    out = _run(spark, [(0, SHARED), (1, SHARED)])
    assert out[0].clean_text == "" and out[0].n_removed == out[0].n_tokens


def test_deterministic_under_repartition(spark):
    rows = [(i, f"doc {i} body " + (SHARED if i % 2 else "no dup here ok")) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, span_dedup(docs).collect()))
    b = sorted(map(tuple, span_dedup(docs.repartition(7)).collect()))
    assert a == b


def test_max_df_guard_skips_hot_windows(spark):
    rows = [(i, SHARED) for i in range(10)] + [(10, "a lonely different doc entirely")]
    out = _run(spark, rows, max_df=5)  # SHARED windows have df=10 > 5
    assert all(r.n_spans == 0 for r in out.values())
