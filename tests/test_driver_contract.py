"""The driver contract itself is load-bearing: the correctness gate
samples the FIRST 50 of queries() in registry order, so ordering and
key alignment are invariants worth pinning, not conventions."""

import json
import os

import __spark_entry__ as e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_oracle_keys_subset_of_queries():
    qs, osql = e.queries(), e.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracles without queries: {sorted(missing)}"


def test_every_query_is_oracle_backed():
    """Round 5: the last rows-only query (lineage) gained an oracle —
    every registry entry must now have an oracle_sql twin."""
    qs, osql = e.queries(), e.oracle_sql()
    rows_only = [q for q in qs if q not in osql]
    assert rows_only == []


def test_gate_window_covers_every_unchecked_query():
    """Every query without a green driver CORRECTNESS row from rounds
    1-4 must sit inside the 50-row gate window (registry order)."""
    qs = list(e.queries())
    checked = set()
    for f in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        path = os.path.join(REPO, f)
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    missed = [q for q in qs if q not in checked and q not in qs[:50]]
    assert not missed, f"never-driver-checked queries past row 50: {missed}"


def test_all_queries_are_callables_with_docstrings():
    for name, fn in e.queries().items():
        assert callable(fn), name
