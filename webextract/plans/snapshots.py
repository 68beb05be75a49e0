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

    def _committed_locations(self) -> list[tuple[str, set[str]]]:
        """Per committed file: its recorded path and the CANDIDATE
        realpaths it may live at. Absolute paths resolve directly;
        RELATIVE paths (a log written with a relative ``output_dir``)
        are resolved against the current CWD AND by ALIGNING the
        recorded path's leading components with the trailing
        components of the log's real ``output_dir`` (a relative
        config path starts with the output_dir string as written, so
        'a/b/out/extracted/x.parquet' anchors at …/a/b/out) — a
        maintenance process running from a different CWD must not
        mistake the entire committed table for orphans."""
        out_dir = os.path.dirname(os.path.realpath(self.dir))
        out_parts = out_dir.split(os.sep)
        locs: list[tuple[str, set[str]]] = []
        for f in self.files_as_of():
            cands = {os.path.realpath(f)}
            if not os.path.isabs(f):
                parts = f.split(os.sep)
                for k in range(len(parts) - 1, 0, -1):
                    if out_parts[-k:] == parts[:k]:
                        cands.add(
                            os.path.realpath(
                                os.path.join(out_dir, *parts[k:])
                            )
                        )
                        break
            locs.append((f, cands))
        return locs

    @staticmethod
    def _walk_parquet(data_dir: str) -> dict[str, str]:
        """realpath → as-found path of every ``*.parquet`` under
        ``data_dir`` (one walk, shared by detection and the guard)."""
        found: dict[str, str] = {}
        for root, _dirs, names in os.walk(data_dir):
            for name in names:
                if name.endswith(".parquet"):
                    p = os.path.join(root, name)
                    found[os.path.realpath(p)] = p
        return found

    def orphan_files(self, data_dir: str) -> list[str]:
        """Data files on disk under ``data_dir`` that NO committed
        snapshot references — the leftovers of a crashed, uncommitted
        wave. Readers never see them anyway (scan planning comes from
        the log, not directory listing); this is the storage-reclaim
        view — the ``remove_orphan_files`` maintenance action of the
        real table format. Only ``*.parquet`` files are considered;
        the snapshot log itself is never a candidate."""
        committed = {c for _, cands in self._committed_locations() for c in cands}
        on_disk = self._walk_parquet(data_dir)
        return sorted(p for rp, p in on_disk.items() if rp not in committed)

    def remove_orphans(self, data_dir: str) -> list[str]:
        """Delete (and return) the orphans. Safe at any point: a file
        is an orphan only if no committed snapshot references it, and
        a wave's files are committed ATOMICALLY after they are fully
        written — so a concurrent wave's in-flight files are the only
        deletable-but-wanted case, which callers rule out by running
        maintenance between waves (exactly Iceberg's contract for
        ``remove_orphan_files``).

        Mass-deletion guards (each raises rather than deleting):
         * an EMPTY log with data files present is indistinguishable
           from a mistyped ``output_dir`` pointing at the wrong table;
         * NOT ONE committed file under ``data_dir`` means the
           data_dir itself is wrong for this log;
         * EVERY committed file must resolve to an existing file —
           one committed path that resolves nowhere means the path
           anchoring is wrong (moved table, differently-spelled
           relative output_dir) or the table is already corrupt, and
           the "orphans" may be the live data."""
        locs = self._committed_locations()
        on_disk = self._walk_parquet(data_dir)
        committed = {c for _, cands in locs for c in cands}
        orphans = sorted(
            p for rp, p in on_disk.items() if rp not in committed
        )
        if orphans and not locs:
            raise RuntimeError(
                "remove_orphans refused: the snapshot log is empty but "
                f"{data_dir!r} contains data files — wrong output_dir or "
                "missing log; deleting would destroy a live table"
            )
        if orphans and locs and not (committed & set(on_disk)):
            raise RuntimeError(
                "remove_orphans refused: no committed file resolves "
                f"under {data_dir!r} — wrong data_dir for this log; "
                "deleting would destroy a live table"
            )
        missing = [
            rec
            for rec, cands in locs
            if not any(os.path.exists(c) for c in cands)
        ]
        if orphans and missing:
            raise RuntimeError(
                "remove_orphans refused: committed file(s) resolve "
                f"nowhere on disk (e.g. {missing[0]!r}) — path anchoring "
                "is wrong or the table is corrupt; the 'orphans' may be "
                "the live data"
            )
        for p in orphans:
            os.remove(p)
        return orphans
