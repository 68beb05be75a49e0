"""Cut golden extraction outputs for the fixture pages — run ONCE.

Mirrors the reference's pre-stored golden results
(test_tipc/results/*.txt, compared by test_tipc/compare_results.py).
After goldens are cut, tokenizer/scorer/merger rules are FROZEN: any
diff in tests/test_golden.py is a regression, not a re-cut.
"""

from __future__ import annotations

import json
import pathlib

from webextract.config import DEFAULT_CONFIG
from webextract.functions import extract_page
from webextract.sources.pages import gen_fixture_pages

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "golden.json"


def main() -> None:
    goldens = {}
    for p in gen_fixture_pages():
        r = extract_page(p["html"], DEFAULT_CONFIG)
        goldens[p["url"]] = {
            "case": p["case"],
            "text": r["text"],
            "spans": [list(s) for s in r["spans"]],
            "blocks_total": r["blocks_total"],
            "blocks_kept": r["blocks_kept"],
            "truncated": r["truncated"],
        }
    OUT.write_text(json.dumps(goldens, ensure_ascii=False, indent=1, sort_keys=True))
    print(f"wrote {len(goldens)} goldens → {OUT}")


if __name__ == "__main__":
    main()
