"""Snapshot log: Iceberg-style commit semantics over plain parquet.

The north rule's checkpoint contract is "resumable from checkpoint via
Iceberg snapshot + processed-partition manifest" (reference analog:
resumable training checkpoints, tools/program.py:218-224, loaded at
tools/train.py:174-175). No Iceberg runtime jar can exist in this
sandbox, so this module implements the SAME commit semantics directly,
executably, on the filesystem the pipeline already writes:

 * a commit is ONE atomic append of a snapshot record — readers never
   see a half-commit (tmp file + ``os.replace``, the same primitive
   Iceberg's HadoopCatalog uses for ``version-hint.text``);
 * each snapshot carries a random ``snapshot_id``, its
   ``parent_id``, a monotonically increasing ``seq``, the bucket ids
   it commits, and the DATA FILE LIST those buckets produced (the
   manifest-file role — readers plan scans from the log, not by
   listing directories);
 * the snapshot chain is VALIDATED on resume: sequence gaps, broken
   parent links or a bucket committed twice all raise instead of
   silently resuming from a corrupt log;
 * time travel: ``read_as_of(spark, snapshot_id)`` reads exactly the
   files committed up to that snapshot.

When an Iceberg catalog IS on the classpath (``iceberg_available``),
``webextract.plans.pipeline.run_extraction_iceberg`` rides the real
table format and records Iceberg's own snapshot ids in this same log —
the protocol is identical, only the commit primitive changes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotLog:
    """Append-only snapshot chain under ``<output_dir>/_snapshots``."""

    def __init__(self, output_dir: str):
        self.dir = os.path.join(output_dir, "_snapshots")

    # -- commit ------------------------------------------------------------

    def append(
        self, buckets: list[int], files: list[str], **stats
    ) -> dict:
        """Commit one snapshot atomically; returns the record."""
        cur = self.current()
        rec = {
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": cur["snapshot_id"] if cur else None,
            "seq": (cur["seq"] + 1) if cur else 0,
            "buckets": sorted(buckets),
            "files": sorted(files),
            **stats,
        }
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f".tmp-{rec['snapshot_id']}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(
            tmp,
            os.path.join(
                self.dir, f"snap-{rec['seq']:05d}-{rec['snapshot_id']}.json"
            ),
        )
        return rec

    # -- read --------------------------------------------------------------

    def entries(self) -> list[dict]:
        """All snapshots ordered by sequence number."""
        if not os.path.isdir(self.dir):
            return []
        recs = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("snap-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    recs.append(json.load(f))
        return sorted(recs, key=lambda r: r["seq"])

    def current(self) -> dict | None:
        recs = self.entries()
        return recs[-1] if recs else None

    def validate(self) -> list[dict]:
        """Raise if the chain is corrupt; return the validated entries.

        Checks: contiguous sequence numbers from 0, every parent link
        matches the previous snapshot, no bucket committed twice (a
        correct resume skips committed buckets, so a duplicate means
        the log and the data diverged).
        """
        recs = self.entries()
        seen_buckets: set[int] = set()
        prev_id = None
        for i, r in enumerate(recs):
            if r["seq"] != i:
                raise RuntimeError(
                    f"snapshot log corrupt: seq {r['seq']} at position {i} "
                    "(gap or reorder — restore the missing snapshot file)"
                )
            if r["parent_id"] != prev_id:
                raise RuntimeError(
                    f"snapshot log corrupt: snapshot {r['snapshot_id']} "
                    f"parent {r['parent_id']} != previous {prev_id}"
                )
            dup = seen_buckets & set(r["buckets"])
            if dup:
                raise RuntimeError(
                    f"snapshot log corrupt: buckets {sorted(dup)} committed "
                    "twice (data/log divergence)"
                )
            seen_buckets.update(r["buckets"])
            prev_id = r["snapshot_id"]
        return recs

    # -- derived views -----------------------------------------------------

    def _as_of(self, snapshot_id: str | None) -> list[dict]:
        recs = self.validate()
        if snapshot_id is None:
            return recs
        for i, r in enumerate(recs):
            if r["snapshot_id"] == snapshot_id:
                return recs[: i + 1]
        raise KeyError(f"unknown snapshot_id {snapshot_id!r}")

    def buckets_as_of(self, snapshot_id: str | None = None) -> set[int]:
        return {b for r in self._as_of(snapshot_id) for b in r["buckets"]}

    def files_as_of(self, snapshot_id: str | None = None) -> list[str]:
        return [f for r in self._as_of(snapshot_id) for f in r["files"]]

    def read_as_of(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> DataFrame:
        """Time-travel scan: exactly the data files committed up to
        ``snapshot_id`` (default: current). Planning comes from the
        log, never from directory listing — half-written files of an
        uncommitted wave are invisible, same as an Iceberg scan."""
        files = self.files_as_of(snapshot_id)
        if not files:
            raise ValueError("no committed snapshots to read")
        return spark.read.parquet(*files)

    # -- maintenance --------------------------------------------------------

    def _committed_realpaths(self) -> set[str]:
        """Committed file paths resolved robustly: absolute paths
        directly; RELATIVE paths (a log written with a relative
        ``output_dir``) are resolved against the current CWD AND by
        ALIGNING the recorded path's leading components with the
        trailing components of the log's real ``output_dir`` (a
        relative config path starts with the output_dir string as
        written, so 'a/b/out/extracted/x.parquet' anchors at
        …/a/b/out) — a maintenance process running from a different
        CWD must not mistake the entire committed table for orphans."""
        out_dir = os.path.dirname(os.path.realpath(self.dir))
        out_parts = out_dir.split(os.sep)
        out: set[str] = set()
        for f in self.files_as_of():
            out.add(os.path.realpath(f))
            if not os.path.isabs(f):
                parts = f.split(os.sep)
                for k in range(len(parts) - 1, 0, -1):
                    if out_parts[-k:] == parts[:k]:
                        out.add(
                            os.path.realpath(
                                os.path.join(out_dir, *parts[k:])
                            )
                        )
                        break
        return out

    def orphan_files(self, data_dir: str) -> list[str]:
        """Data files on disk under ``data_dir`` that NO committed
        snapshot references — the leftovers of a crashed, uncommitted
        wave. Readers never see them anyway (scan planning comes from
        the log, not directory listing); this is the storage-reclaim
        view — the ``remove_orphan_files`` maintenance action of the
        real table format. Only ``*.parquet`` files are considered;
        the snapshot log itself is never a candidate."""
        committed = self._committed_realpaths()
        orphans = []
        for root, _dirs, names in os.walk(data_dir):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                p = os.path.join(root, name)
                if os.path.realpath(p) not in committed:
                    orphans.append(p)
        return sorted(orphans)

    def remove_orphans(self, data_dir: str) -> list[str]:
        """Delete (and return) the orphans. Safe at any point: a file
        is an orphan only if no committed snapshot references it, and
        a wave's files are committed ATOMICALLY after they are fully
        written — so a concurrent wave's in-flight files are the only
        deletable-but-wanted case, which callers rule out by running
        maintenance between waves (exactly Iceberg's contract for
        ``remove_orphan_files``).

        Mass-deletion guard: if the log references committed files but
        NOT ONE of them can be located under ``data_dir``, the path
        anchoring is wrong (wrong dir, moved table, stale log) and the
        "orphans" are almost certainly the live table — raise instead
        of deleting anything."""
        committed = self._committed_realpaths()
        orphans = self.orphan_files(data_dir)
        if committed and orphans:
            on_disk = set()
            for root, _dirs, names in os.walk(data_dir):
                for name in names:
                    if name.endswith(".parquet"):
                        on_disk.add(os.path.realpath(os.path.join(root, name)))
            if not (committed & on_disk):
                raise RuntimeError(
                    "remove_orphans refused: no committed file resolves "
                    f"under {data_dir!r} — path anchoring is wrong and "
                    "deleting would destroy the live table"
                )
        for p in orphans:
            os.remove(p)
        return orphans
