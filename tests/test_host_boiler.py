"""Host-frequency boilerplate removal (q:host_boiler pins exact values
at sf0.01; these tests pin the rule semantics on hand-built corpora)."""

from webextract.operators.dedup import host_boilerplate_strip


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["host", "doc_id", "text"])
    return {r.doc_id: r for r in host_boilerplate_strip(df, **kw).collect()}


def test_template_stripped_everywhere_content_kept(spark):
    rows = [
        (0, 1, "Buy our stuff. Alpha content"),
        (0, 2, "Buy our stuff. Beta content"),
        (0, 3, "Buy our stuff. Gamma content"),
        (0, 4, "Delta only"),
    ]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == "Alpha content"
    assert got[2].clean_text == "Beta content"
    assert got[3].clean_text == "Gamma content"
    assert got[4].clean_text == "Delta only"
    assert got[1].n_boiler == 1 and got[4].n_boiler == 0


def test_boilerplate_is_per_host(spark):
    """The same line is template on host 0 (3/3 docs) but content on
    host 1 (1/3 docs) — the (host, line) keying must keep it there."""
    rows = [
        (0, 1, "Shared banner. A"),
        (0, 2, "Shared banner. B"),
        (0, 3, "Shared banner. C"),
        (1, 4, "Shared banner. D"),
        (1, 5, "Other. E"),
        (1, 6, "Other. F"),
    ]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == "A"
    assert got[4].clean_text == "Shared banner. D"


def test_min_df_guards_tiny_hosts(spark):
    """frac=1.0 on a 2-doc host must not trigger below min_df."""
    rows = [(9, 1, "Tiny banner. X"), (9, 2, "Tiny banner. Y")]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == "Tiny banner. X"


def test_empty_lines_never_flagged_boilerplate(spark):
    """Separator runs split into '' lines on every doc of a host —
    frequency-wise they cross any bar, but flagging '' would silently
    collapse the runs in the rebuilt text. They must be kept."""
    rows = [
        (5, 1, "A. . B"),
        (5, 2, "C. . D"),
        (5, 3, "E. . F"),
    ]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == "A. . B"
    assert got[1].n_boiler == 0


def test_repeated_line_within_one_doc_counts_once(spark):
    """df counts DOCS, not occurrences: one doc repeating a line three
    times must not make it host boilerplate."""
    rows = [
        (2, 1, "Echo. Echo. Echo. Real"),
        (2, 2, "Unrelated one"),
        (2, 3, "Unrelated two"),
    ]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == "Echo. Echo. Echo. Real"


def test_all_boiler_doc_empties(spark):
    rows = [
        (3, 1, "Nav"),
        (3, 2, "Nav"),
        (3, 3, "Nav"),
        (3, 4, "Nav. Payload"),
    ]
    got = _run(spark, rows, min_df=3, min_frac=0.5)
    assert got[1].clean_text == ""
    assert got[1].n_boiler == 1
    assert got[4].clean_text == "Payload"
