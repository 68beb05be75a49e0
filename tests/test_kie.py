"""KIE definition-list pairing (operators/kie.py) — the SER/RE analog.

The q:kie_pairs oracle pins the planted shapes at sf0.01; these tests
pin the pairing rule itself on hostile block streams.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from webextract.operators.kie import kie_pairs, pair_blocks


def test_pair_blocks_rules():
    tags = ["p", "dt", "dd", "dd", "dt", "p", "dd", "dt"]
    txts = ["x", "K1", "v1", "v2", "K2", "y", "v3", "K3"]
    # K1 takes two values; K2 keeps pairing across the intervening <p>
    # (linear reading-order rule); trailing K3 emits nothing
    assert pair_blocks(tags, txts) == [("K1", "v1"), ("K1", "v2"), ("K2", "v3")]


def test_pair_blocks_orphans_and_empties():
    assert pair_blocks(["dd"], ["orphan"]) == []
    assert pair_blocks(["dt"], ["lonely"]) == []
    # empty dt does NOT become the key; empty dd emits nothing
    assert pair_blocks(["dt", "dt", "dd", "dd"], ["", "K", "", "v"]) == [("K", "v")]
    assert pair_blocks([], []) == []


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["dt", "dd", "p", "li"]),
            st.sampled_from(["", "a", "bb", "ccc"]),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_pair_blocks_invariants(stream):
    tags = [t for t, _ in stream]
    txts = [x for _, x in stream]
    pairs = pair_blocks(tags, txts)
    nonempty = [(t, x) for t, x in stream if x]
    # one pair per non-empty dd that has some preceding non-empty dt
    seen_dt = False
    expected = 0
    for t, _ in nonempty:
        if t == "dt":
            seen_dt = True
        elif t == "dd" and seen_dt:
            expected += 1
    assert len(pairs) == expected
    # every key/value text exists in the stream under the right tag
    dts = {x for t, x in nonempty if t == "dt"}
    dds = {x for t, x in nonempty if t == "dd"}
    assert all(k in dts and v in dds for k, v in pairs)


def test_kie_pairs_spark_end_to_end(spark):
    html = (
        "<html><body><dl><dt>Author</dt><dd>Ada</dd>"
        "<dt>Tags</dt><dd>math</dd><dd>logic</dd></dl></body></html>"
    )
    pages = spark.createDataFrame(
        [Row(url="u1", html=bytearray(html.encode()))]
    )
    rows = sorted(
        (r.pair_id, r.key, r.value) for r in kie_pairs(pages).collect()
    )
    assert rows == [(1, "Author", "Ada"), (2, "Tags", "math"), (3, "Tags", "logic")]


def test_group_list_items_runs_and_breaks():
    from webextract.operators.kie import group_list_items

    tags = ["p", "li", "li", "p", "li", "h2", "li", "li"]
    txts = ["x", "a", "b", "y", "c", "H", "d", "e"]
    assert group_list_items(tags, txts) == [
        (1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (3, 1, "d"), (3, 2, "e"),
    ]
    # empty li is skipped without breaking; empty breaker is dropped
    # upstream (never surfaces) so it cannot break either
    assert group_list_items(["li", "li", "li"], ["a", "", "b"]) == [
        (1, 1, "a"), (1, 2, "b"),
    ]
    assert group_list_items([], []) == []


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["li", "p", "h2"]),
            st.sampled_from(["", "a", "bb"]),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_group_list_items_invariants(stream):
    from webextract.operators.kie import group_list_items

    out = group_list_items([t for t, _ in stream], [x for _, x in stream])
    # one row per non-empty li, in order
    assert [t for *_, t in out] == [x for tag, x in stream if tag == "li" and x]
    # ordinals are dense 1..n within each list_id, list_ids non-decreasing
    seen = {}
    last_lid = 0
    for lid, o, _ in out:
        assert lid >= last_lid
        last_lid = lid
        seen[lid] = seen.get(lid, 0) + 1
        assert o == seen[lid]


def test_list_items_spark_end_to_end(spark):
    html = (
        "<html><body><ul><li>First</li><li>Second</li></ul>"
        "<p>break</p><ol><li>Third</li></ol></body></html>"
    )
    from webextract.operators.kie import list_items

    pages = spark.createDataFrame(
        [Row(url="u1", html=bytearray(html.encode()))]
    )
    rows = sorted(
        (r.list_id, r.ordinal, r.text) for r in list_items(pages).collect()
    )
    assert rows == [(1, 1, "First"), (1, 2, "Second"), (2, 1, "Third")]
