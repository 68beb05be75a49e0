"""Arrow batch-size sweep at the two-cluster-size protocol.

For each ``spark.sql.execution.arrow.maxRecordsPerBatch`` candidate,
run the identical pinned extraction job at local[N] and local[4N]
(scaling_bench.run_level) and report throughput at both plus the N→4N
efficiency. Python worker reuse (``spark.python.worker.reuse``) is
Spark's default=true and stays on — one forked worker per core serves
every Arrow batch, so the per-batch cost is ser-de only, no process
spawn.

Usage: python scripts/arrow_sweep.py [sf_dir] [N] [replicas] [runs]
Writes one JSON line per batch size + a summary line; redirect to
bench/arrow_sweep.json for the record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from scaling_bench import _GEN, run_level  # noqa: E402

BATCHES = (512, 1024, 2048, 4096)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    pages_path = os.environ.get(
        "WEBEXTRACT_BENCH_PAGES", "/tmp/webextract_bench_pages"
    )
    subprocess.run(
        [sys.executable, "-c", _GEN, sf_dir, str(replicas), pages_path],
        capture_output=True, text=True, check=True,
    )
    results = []
    for batch in BATCHES:
        lo = run_level(pages_path, n, batch, runs)
        hi = run_level(pages_path, 4 * n, batch, runs)
        eff = hi["pages_per_sec"] / (4 * lo["pages_per_sec"])
        row = {
            "arrow_batch": batch,
            "throughput_N": round(lo["pages_per_sec"], 1),
            "throughput_4N": round(hi["pages_per_sec"], 1),
            "scaling_efficiency": round(eff, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    best = max(results, key=lambda r: r["throughput_4N"])
    print(json.dumps({
        "sf_dir": sf_dir, "pages": replicas * 5000 if "0.1" in sf_dir else None,
        "n_cpus": n, "sweep": results, "best": best,
    }))


if __name__ == "__main__":
    main()
