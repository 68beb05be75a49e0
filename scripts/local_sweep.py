"""Full-registry local correctness sweep → CORRECTNESS_LOCAL_r{N}.json.

The driver's per-round gate samples only the first 50 registry
entries; this sweep runs EVERY ``queries()`` entry against its
``oracle_sql()`` twin (the check_oracle comparison: row count, column
names, dtype kinds, exact values) at all three fixture scales and
writes one committed JSON artifact::

    {"<query>": {"sf0.001": "ok", "sf0.01": "ok", "sf0.1": "ok"}, ...}

Usage: python scripts/local_sweep.py [out.json] [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from check_oracle import TABLES, normalize  # noqa: E402  (sibling import)

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    a, b = normalize(sdf), normalize(odf)
    if list(a.columns) != list(b.columns):
        return f"FAIL columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows {len(a)} vs {len(b)}"
    kind_bad = [
        c
        for c in a.columns
        if a[c].dtype.kind != b[c].dtype.kind
        and {a[c].dtype.kind, b[c].dtype.kind} <= {"i", "u", "f"}
    ]
    if kind_bad:
        return f"FAIL dtype kinds {kind_bad}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as ex:
        return "FAIL " + str(ex).splitlines()[0]
    return "ok"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_LOCAL_r5.json"
    sf_dirs = sys.argv[2:] or DEFAULT_SFS

    import __spark_entry__ as e
    from webextract.session import get_spark

    spark = get_spark("local-sweep")
    qs, oracles = e.queries(), e.oracle_sql()
    result: dict[str, dict[str, str]] = {q: {} for q in qs}
    failures = 0
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                sdf = fn(spark, sf_dir).toPandas()
                if name not in oracles:
                    verdict = f"rows-only n={len(sdf)}"
                else:
                    verdict = compare(sdf, con.sql(oracles[name]).df())
            except Exception as ex:  # noqa: BLE001 — record, keep sweeping
                verdict = f"FAIL error {type(ex).__name__}: {ex}"[:300]
            result[name][sf] = verdict
            if verdict.startswith("FAIL"):
                failures += 1
            print(
                f"{sf:>8} {name:>22}: {verdict}"
                f"  ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        con.close()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"\nwrote {out_path}; {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
