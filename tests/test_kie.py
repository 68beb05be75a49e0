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
