"""LakeTable: an append-only snapshot log over parquet data files.

Layout (all under one root directory):

    root/
      data/v{N}/part-*.parquet   -- files written by commit N
      _log/v{N}.json             -- snapshot N: the FULL manifest

Each snapshot records every live file with its row count and per-column
min/max stats (read from the parquet footers, never from the data), so
every read is metadata-first:

- time travel  = read the file list of an older snapshot;
- incremental  = files whose ``added`` version is in (since, to];
- stats pruning = drop files whose [min,max] cannot overlap the
  predicate before Spark ever lists them.

Concurrency: a commit materializes its data files first, then
publishes by creating ``_log/v{N}.json`` with O_EXCL — if two writers
race, exactly one create succeeds and the loser gets CommitConflict
(optimistic concurrency, same contract as Delta/Iceberg). A crash
before the log write leaves orphan data files that no snapshot
references — readers never see them (test-asserted).

Scale: the log is one JSON document per commit, sized by FILE COUNT
(~10^6 entries at 100 TB — metadata scale); data files are never
rewritten by append commits, and pruning decisions happen driver-side
on the manifest before any task launches. The full-manifest-per-
snapshot choice (a Delta "checkpoint" every commit) trades tiny log
writes for O(1) snapshot loads — right while file count stays
metadata-scale; at larger counts the log itself becomes a parquet
table and `layout_compaction_plan` bins it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import date, datetime
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer published the same version first."""


def _zvalue(df: DataFrame, a: str, b: str):
    """16-bit Morton code of integer columns ``a`` and ``b``, each
    range-quantized to 8 bits against its own [min,max] (one metadata
    aggregate at write time — same order of cost as the sampling pass
    repartitionByRange does anyway). All arithmetic is integer-exact
    (``div``), so the layout is deterministic."""
    r = df.agg(F.min(a), F.max(a), F.min(b), F.max(b)).first()
    amin, amax, bmin, bmax = (int(x) for x in r)
    aspan = max(amax - amin + 1, 1)
    bspan = max(bmax - bmin + 1, 1)
    qa = F.expr(f"((`{a}` - {amin}) * 256) div {aspan}")
    qb = F.expr(f"((`{b}` - {bmin}) * 256) div {bspan}")
    z = F.lit(0)
    for i in range(8):
        z = z + F.shiftleft(
            F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _ser(v: Any) -> Any:
    """Stats serializer: ISO strings for temporal (lexicographic order
    == chronological order), native JSON for numerics/strings."""
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


def _overlapping(entries, col: str, lo: Any, hi: Any):
    """Manifest min/max pruning: the entries whose [min, max] on
    ``col`` can overlap [lo, hi) — the SINGLE pruning rule every
    predicate-ranged write path (delete_where, delete_where_dv's scan
    AND its count-guard job, replace_where) reads its file set from,
    so no path can scan wider than the manifest stats allow. Entries
    with no stats for ``col`` are conservatively kept (schema
    evolution: a file written before the column existed)."""
    lo_s, hi_s = _ser(lo), _ser(hi)
    return [
        e
        for e in entries
        if col not in e.stats
        or not (e.stats[col][0] >= hi_s or e.stats[col][1] < lo_s)
    ]


# Spark-side normalization of ``input_file_name()`` (a ``file:``-scheme
# URI) back to the plain local path the manifest stores, so per-file
# grouping can join task rows to FileEntry records without a driver
# loop. url_decode undoes %-escapes for paths with special characters.
_FILE_EXPR = "url_decode(regexp_replace(input_file_name(), '^[a-zA-Z]+:/+', '/'))"


@dataclass
class FileEntry:
    path: str
    rows: int
    stats: dict[str, list]  # col -> [min, max], serialized
    added: int  # commit version that added the file
    bytes: int = 0
    # False for rewrite (compaction) commits: the rows are not new, so
    # incremental consumers must not re-emit them (Delta's dataChange
    # flag, Iceberg's rewrite snapshots — same public contract)
    data_change: bool = True
    # equality-delete vector sidecar (Iceberg v2 equality-delete files,
    # scoped to this data file): path of a JSON doc {key_col, keys};
    # read() drops those keys from THIS file without rewriting it
    dv: str | None = None

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "rows": self.rows,
            "stats": self.stats,
            "added": self.added,
            "bytes": self.bytes,
            "data_change": self.data_change,
            "dv": self.dv,
        }

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(
            d["path"],
            d["rows"],
            d["stats"],
            d["added"],
            d.get("bytes", 0),
            d.get("data_change", True),
            d.get("dv"),
        )


class LakeTable:
    def __init__(self, root: str | os.PathLike):
        # Canonicalize ONCE: every manifest entry stores str(path) under
        # this root, and delete_where_dv/add_blooms/read()/compact_dv
        # match those strings against normalized input_file_name()
        # (_FILE_EXPR). A relative or symlinked root would make Hadoop
        # qualify the scan paths differently and every lookup would
        # miss silently (no-op deletes, empty blooms) — resolve() keeps
        # both sides on the same canonical absolute path, and the
        # grouped-file guards in those methods raise loudly if a scan
        # ever yields a file name outside the manifest anyway.
        self.root = Path(root).resolve()
        self.log_dir = self.root / "_log"
        self.data_dir = self.root / "data"

    # --- log ---------------------------------------------------------------

    def versions(self) -> list[int]:
        if not self.log_dir.is_dir():
            return []
        return sorted(
            int(p.stem[1:]) for p in self.log_dir.glob("v*.json")
        )

    @property
    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def manifest(self, version: int | None = None) -> list[FileEntry]:
        v = self.current_version if version is None else version
        if v == 0:
            return []
        doc = json.loads((self.log_dir / f"v{v}.json").read_text())
        return [FileEntry.from_json(d) for d in doc["files"]]

    def txns(self, version: int | None = None) -> dict[str, int]:
        """Application transaction watermarks carried by a snapshot:
        app_id -> highest batch id committed (the public Delta ``txn``
        action). Each commit copies the parent's map forward, so the
        CURRENT snapshot always answers "has this app already committed
        batch N?" — the idempotence test an exactly-once streaming sink
        replays against."""
        v = self.current_version if version is None else version
        if v == 0:
            return {}
        doc = json.loads((self.log_dir / f"v{v}.json").read_text())
        return {k: int(b) for k, b in doc.get("txns", {}).items()}

    def last_txn(self, app_id: str) -> int:
        """Highest batch id ``app_id`` has committed (-1 if none)."""
        return self.txns().get(app_id, -1)

    # --- write -------------------------------------------------------------

    def commit_append(
        self,
        df: DataFrame,
        stats_cols: tuple[str, ...] = (),
        num_files: int | None = None,
        range_by: str | None = None,
        zorder_by: tuple[str, str] | None = None,
        expected_parent: int | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Write ``df`` as new data files and publish the next snapshot.

        ``range_by`` range-partitions the rows by that column before
        writing, so each file covers a DISJOINT value range — what
        makes min/max pruning effective (the write-side half of
        layout_zorder_stats' argument).

        ``zorder_by=(a, b)`` instead clusters by the Morton interleave
        of the two integer columns, each range-quantized to 8 bits
        against its own [min,max] (one metadata agg) — every file then
        covers a narrow value range on BOTH columns, so manifest-stats
        pruning works for predicates on either (the Delta/Iceberg
        ``ZORDER BY`` write path; analysis twin: layout_zorder_stats).
        At scale this is one range shuffle + per-partition sort, the
        same cost as ``range_by``.

        ``expected_parent`` pins the snapshot this commit builds on
        (optimistic concurrency): if another writer published first,
        the O_EXCL log create raises CommitConflict instead of
        silently dropping their files from the merged manifest.

        ``txn=(app_id, batch_id)`` makes the commit IDEMPOTENT per
        application batch (the public Delta ``txn`` action): if the
        parent snapshot already records ``app_id`` at ``batch_id`` or
        later, the commit is a no-op returning the current version —
        what lets a restarted streaming query replay its last
        micro-batch without double-writing (see ``streaming_sink``).
        """
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        txns = self.txns(parent)
        if txn is not None and txns.get(txn[0], -1) >= txn[1]:
            return parent  # replayed batch: already committed
        version = parent + 1
        out = self.data_dir / f"v{version}"
        drop_z = False
        if zorder_by is not None:
            df = df.withColumn("__z", _zvalue(df, *zorder_by))
            drop_z = True
            if num_files is not None:
                df = df.repartitionByRange(num_files, "__z")
            df = df.sortWithinPartitions("__z")
        elif num_files is not None and range_by is not None:
            df = df.repartitionByRange(num_files, range_by)
        elif num_files is not None:
            df = df.repartition(num_files)
        if drop_z:
            df = df.drop("__z")
        df.write.mode("overwrite").parquet(str(out))

        entries = self.manifest(parent)  # parent snapshot's live files
        for p in sorted(out.glob("*.parquet")):
            entries.append(self._file_entry(p, stats_cols, version))
        if txn is not None:
            txns[txn[0]] = txn[1]
        self._publish(version, entries, txns)
        return version

    def _file_entry(
        self,
        path: Path,
        stats_cols: tuple[str, ...],
        version: int,
        data_change: bool = True,
    ) -> FileEntry:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for col in stats_cols:
            idx = names[col]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                stats[col] = [_ser(lo), _ser(hi)]
        return FileEntry(
            str(path),
            md.num_rows,
            stats,
            version,
            os.path.getsize(path),
            data_change,
        )

    def _publish(
        self,
        version: int,
        entries: list[FileEntry],
        txns: dict[str, int] | None = None,
    ) -> None:
        self.log_dir.mkdir(parents=True, exist_ok=True)
        doc = json.dumps(
            {
                "version": version,
                "files": [e.to_json() for e in entries],
                "txns": txns if txns is not None else self.txns(version - 1),
            },
            indent=None,
        )
        try:
            # O_EXCL create IS the commit: exactly one writer can
            # publish a given version.
            with open(self.log_dir / f"v{version}.json", "x") as f:
                f.write(doc)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already published"
            ) from e

    def compact(
        self,
        spark: SparkSession,
        target_bytes: int,
        stats_cols: tuple[str, ...] = (),
        expected_parent: int | None = None,
    ) -> int:
        """Rewrite commit: bin-pack small files (the shared sorted-
        greedy planner behind layout_compaction_plan) and rewrite each
        multi-file bin as one file. The new snapshot carries the
        rewritten files with ``data_change=False`` — incremental
        consumers skip them (the rows are not new), while time travel
        to any pre-compaction version still reads the original files,
        which stay on disk until a future vacuum.

        Returns the new version, or the parent version unchanged if
        every bin already holds a single file (nothing to do — no
        empty commit is published)."""
        from ..operators.layout import assign_compaction_bins

        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        mdf = spark.createDataFrame(
            [(i, e.bytes) for i, e in enumerate(entries)],
            "file_id long, size_bytes long",
        )
        bins: dict[int, list[FileEntry]] = {}
        for r in assign_compaction_bins(mdf, target_bytes).collect():
            bins.setdefault(r.bin, []).append(entries[r.file_id])
        version = parent + 1
        out = self.data_dir / f"v{version}"
        new_entries: list[FileEntry] = []
        removed: set[str] = set()
        for b in sorted(bins):
            group = bins[b]
            if len(group) < 2:
                continue  # already compact
            bin_dir = out / f"bin{b}"
            spark.read.parquet(*[e.path for e in group]).coalesce(
                1
            ).write.mode("overwrite").parquet(str(bin_dir))
            for p in sorted(bin_dir.glob("*.parquet")):
                new_entries.append(
                    self._file_entry(
                        p, stats_cols, version, data_change=False
                    )
                )
            removed.update(e.path for e in group)
        if not removed:
            return parent
        survivors = [e for e in entries if e.path not in removed]
        self._publish(version, survivors + new_entries)
        return version

    def delete_where(
        self,
        spark: SparkSession,
        col: str,
        lo: Any,
        hi: Any,
        predicate,
        stats_cols: tuple[str, ...] = (),
        expected_parent: int | None = None,
    ) -> int:
        """Copy-on-write delete: rows matching ``predicate`` (a typed
        Spark Column marking rows TO DELETE; its [lo, hi) bounds on
        ``col`` are declared separately for the stats test) are dropped
        by rewriting ONLY the files whose [min,max] stats overlap the
        range — every other file keeps its path and is never read.
        This is the manifest-stats win on the WRITE side: at 100 TB a
        date-bounded delete (GDPR purge, bad-batch rollback) touches
        the few files the range maps to, not the table.

        Deletes CHANGE data, so the rewritten survivors republish with
        ``data_change=True``; feeds that need row-level retractions
        layer the CDC operator family (cdc_tombstone_merge) on top.

        Returns the new version (parent unchanged if no file overlaps).
        """
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        touched = _overlapping(entries, col, lo, hi)
        if not touched:
            return parent
        version = parent + 1
        out = self.data_dir / f"v{version}"
        survivors = spark.read.parquet(
            *[e.path for e in touched]
        ).filter(~predicate)
        survivors.write.mode("overwrite").parquet(str(out))
        new_entries = [
            self._file_entry(p, stats_cols, version)
            for p in sorted(out.glob("*.parquet"))
        ]
        new_entries = [e for e in new_entries if e.rows > 0]
        removed = {e.path for e in touched}
        kept = [e for e in entries if e.path not in removed]
        self._publish(version, kept + new_entries)
        return version

    # per-file DV key-list cap: past this, the sidecar stops being
    # metadata-scale and the copy-on-write path is the right tool
    DV_MAX_KEYS = 100_000

    def delete_where_dv(
        self,
        spark: SparkSession,
        col: str,
        lo: Any,
        hi: Any,
        predicate,
        key_col: str,
        expected_parent: int | None = None,
    ) -> int:
        """Merge-on-read delete via equality-delete vectors (the
        Iceberg v2 delete-file pattern): rows matching ``predicate``
        are removed WITHOUT rewriting any data file. Manifest stats
        prune to the files whose [min,max] on ``col`` can overlap
        [lo, hi); for each, the deleted ``key_col`` values are computed
        by scanning JUST that file (predicate pushed down) and written
        as a JSON sidecar; the new manifest version re-lists the same
        data files with their ``dv`` pointer set. ``read()`` applies
        the vectors as a broadcast anti-join over only the DV-carrying
        files — untouched files never pay it.

        This is the low-latency delete for 100 TB tables (GDPR purge,
        bad-row retraction at minutes cadence); ``delete_where`` is the
        copy-on-write sibling that compaction eventually converges the
        table back to. Sidecars are capped at ``DV_MAX_KEYS`` keys per
        file — past that the DV is no longer metadata-scale and the
        caller is pointed at the rewrite path.

        Scale contract: the matched keys are computed by TWO
        stats-pruned scans over every touched file grouped by
        ``input_file_name()`` (a constant-memory count-only
        validation job, then the bounded collecting job) — a
        predicate touching thousands of files costs a CONSTANT
        number of Spark jobs, never a per-file driver loop. A file that already carries a DV gets
        its old sidecar's keys UNIONED into the replacement (repeat
        deletes accumulate; the per-file cap applies to the merged
        set), so no earlier commit's deletions are resurrected.

        Returns the new version (parent unchanged if no file overlaps).
        """
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        touched_paths = {e.path for e in _overlapping(entries, col, lo, hi)}
        if not touched_paths:
            return parent
        # TWO constant-count jobs over ALL touched files, both grouped
        # by source file (ADVICE r9: the r8 single-job merge let
        # collect_set materialize an UNBOUNDED per-file key set in
        # executor aggregation buffers before the cap error fired —
        # an unbounded delete predicate could pressure executor memory
        # at scale). Job 1 is the cheap count-only validation pass:
        # countDistinct aggregates in constant memory per group, so an
        # over-cap predicate fails loudly WITHOUT ever buffering a key
        # list. Job 2 (reached only when every file is under the cap)
        # collects the key lists, now provably bounded at DV_MAX_KEYS
        # keys per file in both executor buffers and driver transfer.
        # The job count stays CONSTANT in touched-file count — never a
        # per-file driver loop (pinned by tests/test_lake_dv_round8).
        # mergeSchema matches every other multi-file read path — after
        # schema evolution a predicate/key column added in a later
        # commit must still resolve (files lacking it contribute NULLs,
        # which match no equality key).
        hits = (
            spark.read.option("mergeSchema", "true")
            .parquet(*sorted(touched_paths))
            .filter(predicate)
            .select(
                F.expr(_FILE_EXPR).alias("__file"),
                F.col(key_col).alias("__k"),
            )
        )
        counts = (
            hits.groupBy("__file")
            .agg(F.countDistinct("__k").alias("n"))
            .collect()
        )
        over = [r for r in counts if r["n"] > self.DV_MAX_KEYS]
        if over:
            raise ValueError(
                f"DV for {over[0]['__file']} exceeds "
                f"{self.DV_MAX_KEYS} keys; use delete_where "
                "(copy-on-write rewrite) for deletes this wide"
            )
        # Defense-in-depth bound (ADVICE r10): the two jobs re-execute
        # the scan independently, so anything that changes the matched
        # set between them (a concurrent writer, a non-deterministic
        # predicate) could otherwise ship an unbounded key list to the
        # driver despite the count job's validation. The slice caps the
        # per-file transfer at DV_MAX_KEYS+1 (free when the count job
        # already validated), and the +1 sentinel makes a between-job
        # drift loud below instead of silently dropping deletions.
        grouped = (
            hits.groupBy("__file")
            .agg(
                F.slice(
                    F.sort_array(F.collect_set("__k")),
                    1,
                    self.DV_MAX_KEYS + 1,
                ).alias("__keys")
            )
            .collect()
        )
        keys_by_file = {r["__file"]: list(r["__keys"]) for r in grouped}
        drifted = [
            f
            for f, ks in keys_by_file.items()
            if len(ks) > self.DV_MAX_KEYS
        ]
        if drifted:
            raise RuntimeError(
                "delete_where_dv matched-key set changed between the "
                "count-validation job and the collecting job for "
                f"{sorted(drifted)[:3]} (concurrent writer or "
                "non-deterministic predicate?); aborting commit"
            )
        # loud guard (ADVICE r8): a grouped file name outside the
        # stats-pruned touch set means _FILE_EXPR and the manifest
        # disagree on path form — deletes would otherwise no-op silently
        unmatched = set(keys_by_file) - touched_paths
        if unmatched:
            raise RuntimeError(
                "delete_where_dv grouped scan returned file paths not "
                f"in the manifest's touched set: {sorted(unmatched)[:3]}"
            )
        version = parent + 1
        dv_dir = self.root / "_dv" / f"v{version}"
        dv_dir.mkdir(parents=True, exist_ok=True)
        new_entries = []
        for e in entries:
            keys = keys_by_file.get(e.path, [])
            if e.path not in touched_paths or (not keys and not e.dv):
                new_entries.append(e)
                continue
            if e.dv:
                # merge, never replace: a second delete touching an
                # already-DV-carrying file must keep the first
                # commit's deletions
                old = json.loads(Path(e.dv).read_text())
                if old["key_col"] != key_col:
                    raise ValueError(
                        f"DV key column mismatch for {e.path}: "
                        f"existing sidecar uses {old['key_col']!r}, "
                        f"delete requested on {key_col!r}"
                    )
                keys = sorted(set(keys) | set(old["keys"]))
                if len(keys) > self.DV_MAX_KEYS:
                    raise ValueError(
                        f"merged DV for {e.path} exceeds "
                        f"{self.DV_MAX_KEYS} keys; use delete_where "
                        "(copy-on-write rewrite) for deletes this wide"
                    )
            if not keys:
                new_entries.append(e)
                continue
            dv_path = dv_dir / f"{Path(e.path).stem}.json"
            dv_path.write_text(
                json.dumps({"key_col": key_col, "keys": sorted(keys)})
            )
            new_entries.append(
                FileEntry(
                    e.path,
                    e.rows,
                    e.stats,
                    e.added,
                    e.bytes,
                    data_change=e.data_change,
                    dv=str(dv_path),
                )
            )
        self._publish(version, new_entries)
        return version

    def compact_dv(
        self,
        spark: SparkSession,
        stats_cols: tuple[str, ...] = (),
        expected_parent: int | None = None,
    ) -> int:
        """Fold delete vectors back into clean data files: each
        DV-carrying file is rewritten WITHOUT its deleted keys and its
        ``dv`` pointer cleared; DV-free files keep their paths
        untouched. This is the maintenance commit that converges a
        merge-on-read table back to copy-on-write read performance
        (Iceberg's rewrite-data-files with delete compaction) — the
        rewritten rows are NOT new data, so survivors republish with
        ``data_change=False`` and incremental consumers skip them.

        Scale contract: ONE scan over every DV-carrying file with a
        broadcast anti-join on (source file, key) — the same per-file
        semantics ``read()`` applies — and ONE write job for all
        survivors (compaction is free to re-bin rows across source
        files; that is its job). Thousands of DV files cost a constant
        number of Spark jobs, never a per-file driver loop.

        Returns the new version (parent unchanged if no DVs exist)."""
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        dv_entries = [e for e in entries if e.dv]
        if not dv_entries:
            return parent
        key_cols, pairs = set(), []
        for e in dv_entries:
            doc = json.loads(Path(e.dv).read_text())
            key_cols.add(doc["key_col"])
            pairs.extend((e.path, k) for k in doc["keys"])
        if len(key_cols) != 1:
            raise ValueError(f"mixed DV key columns: {sorted(key_cols)}")
        key_col = key_cols.pop()
        scan = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in dv_entries]
        )
        key_df = spark.createDataFrame(
            pairs,
            f"__dv_file string, "
            f"{key_col} {scan.schema[key_col].dataType.simpleString()}",
        )
        surv = (
            scan.withColumn("__dv_file", F.expr(_FILE_EXPR))
            .join(F.broadcast(key_df), ["__dv_file", key_col], "left_anti")
            .drop("__dv_file")
        )
        version = parent + 1
        out = self.data_dir / f"v{version}"
        surv.write.mode("overwrite").parquet(str(out))
        new_entries = [e for e in entries if not e.dv]
        for p in sorted(out.glob("*.parquet")):
            ent = self._file_entry(p, stats_cols, version)
            ent.data_change = False  # rewrite, not new rows
            if ent.rows > 0:
                new_entries.append(ent)
        self._publish(version, new_entries)
        return version

    def merge_upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_col: str,
        stats_cols: tuple[str, ...] = (),
        num_files: int | None = None,
        expected_parent: int | None = None,
    ) -> int:
        """MERGE INTO, latest-wins on ``key_col``: rows of ``source``
        replace same-key rows of the table; keys the table has never
        seen are inserts. Copy-on-write with STATS-PRUNED file touch —
        the standard lakehouse upsert:

        1. join the manifest's per-file [min,max] key stats against the
           source's DISTINCT keys (metadata ⋈ keys — the big table is
           not read); a file is *touched* only if some source key can
           land inside its range;
        2. rewrite = (touched files' rows) ANTI JOIN source keys,
           UNION the whole source; untouched files keep their exact
           paths and are never read;
        3. publish as one snapshot (``data_change=True`` — merged rows
           ARE new data for downstream consumers).

        At 100 TB with key-range-partitioned commits, a merge whose
        source keys cluster (the common CDC case: recent entities)
        touches those files only; the anti-join shuffles just the
        touched subset, broadcast when the source is batch-sized.
        If NO file overlaps (all keys new), the merge degrades to a
        pure append of the source. Returns the new version.
        """
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        keys = source.select(F.col(key_col).alias("__mk")).distinct()
        ranged = [
            (i, e.stats[key_col][0], e.stats[key_col][1])
            for i, e in enumerate(entries)
            if key_col in e.stats
        ]
        touched_idx = {
            i for i, e in enumerate(entries) if key_col not in e.stats
        }
        if ranged:
            mdf = spark.createDataFrame(
                ranged, ["__file_id", "__lo", "__hi"]
            )
            hits = (
                mdf.join(
                    F.broadcast(keys),
                    (F.col("__mk") >= F.col("__lo"))
                    & (F.col("__mk") <= F.col("__hi")),
                )
                .select("__file_id")
                .distinct()
                .collect()
            )
            touched_idx.update(r["__file_id"] for r in hits)
        touched = [entries[i] for i in sorted(touched_idx)]

        version = parent + 1
        out = self.data_dir / f"v{version}"
        if touched:
            old = (
                spark.read.option("mergeSchema", "true")
                .parquet(*[e.path for e in touched])
                .join(
                    F.broadcast(keys),
                    F.col(key_col) == F.col("__mk"),
                    "left_anti",
                )
            )
            merged = old.unionByName(
                source, allowMissingColumns=True
            )
        else:
            merged = source
        if num_files is not None:
            merged = merged.repartitionByRange(num_files, key_col)
        merged.write.mode("overwrite").parquet(str(out))
        new_entries = [
            self._file_entry(p, stats_cols, version)
            for p in sorted(out.glob("*.parquet"))
        ]
        new_entries = [e for e in new_entries if e.rows > 0]
        removed = {e.path for e in touched}
        kept = [e for e in entries if e.path not in removed]
        self._publish(version, kept + new_entries)
        return version

    # bloom sidecar sizing: m bits / k Knuth multiplicative hashes.
    # m = 1<<17 keeps the false-positive rate ~1% up to ~10k distinct
    # keys per file; the sidecar stores SET BIT indices (metadata-scale
    # by construction: <= m entries however many rows the file has).
    BLOOM_M = 1 << 17
    BLOOM_HASHES = (2654435761, 2246822519, 3266489917)

    def add_blooms(
        self,
        spark: SparkSession,
        col: str,
        expected_parent: int | None = None,
    ) -> int:
        """Attach per-file BLOOM sidecars for ``col`` (the Parquet
        bloom-filter / Iceberg bloom story, lifted to the manifest):
        each live data file gets a bitset built from its distinct
        ``col`` values under k fixed Knuth multiplicative hashes.
        Point-lookup reads then skip files whose bloom excludes the
        key — the pruning that min/max stats CANNOT give for a
        high-cardinality key scattered across every file's range.

        The bitset is computed DISTRIBUTED — ONE scan over every live
        file grouped by ``input_file_name()``, aggregated to distinct
        bit positions (bounded by k·m per file, so the driver-side
        sidecar is metadata-scale regardless of file row count) — and
        stored as sorted set-bit indices in JSON next to the log.

        NULL keys never match a point lookup (``col = value`` is never
        true for NULL), so null rows are filtered before hashing and
        recorded as a ``has_nulls`` flag for introspection; a file of
        only NULLs gets an empty bloom and is correctly pruned by every
        lookup. Non-integral key columns are rejected loudly — a silent
        ``cast('long')`` of e.g. a string yields NULL hashes and a
        bloom that prunes files still holding the key.

        Returns the new version."""
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        if not entries:
            # empty table (version 0 / fully vacuumed): nothing to
            # bloom; a bare spark.read.parquet() would raise a
            # confusing TypeError. No-op like the pre-scan behavior.
            return parent
        probe = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in entries]
        )
        dtype = probe.schema[col].dataType.simpleString()
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"bloom key column {col!r} has type {dtype}; only "
                "integral key columns are supported (a long cast of "
                f"{dtype} would silently hash NULL)"
            )
        scan = probe.select(
            F.expr(_FILE_EXPR).alias("__file"),
            F.col(col).cast("long").alias("k"),
        )
        rows = (
            scan.filter(F.col("k").isNotNull())
            .select(
                "__file",
                F.explode(
                    F.array(
                        *[
                            ((F.col("k") * h) % (1 << 32))
                            .cast("long")
                            .bitwiseAND(self.BLOOM_M - 1)
                            for h in self.BLOOM_HASHES
                        ]
                    )
                ).alias("b"),
            )
            .groupBy("__file")
            .agg(F.sort_array(F.collect_set("b")).alias("bits"))
            .collect()
        )
        bits_by_file = {r["__file"]: [int(b) for b in r["bits"]] for r in rows}
        # loud guard (ADVICE r8): a grouped file name outside the
        # manifest means _FILE_EXPR and the stored paths disagree —
        # every bloom would otherwise be written empty and
        # read_bloom_pruned would prune ALL files silently
        manifest_paths = {e.path for e in entries}
        unmatched = set(bits_by_file) - manifest_paths
        if unmatched:
            raise RuntimeError(
                "add_blooms grouped scan returned file paths not in "
                f"the manifest: {sorted(unmatched)[:3]}"
            )
        null_files = {
            r["__file"]
            for r in scan.filter(F.col("k").isNull())
            .select("__file")
            .distinct()
            .collect()
        }
        version = parent + 1
        bdir = self.root / "_bloom" / f"v{version}"
        bdir.mkdir(parents=True, exist_ok=True)
        new_entries = []
        for e in entries:
            bpath = bdir / f"{Path(e.path).stem}.json"
            bpath.write_text(
                json.dumps(
                    {
                        "col": col,
                        "m": self.BLOOM_M,
                        "bits": bits_by_file.get(e.path, []),
                        "has_nulls": e.path in null_files,
                    }
                )
            )
            stats = dict(e.stats)
            stats[f"__bloom__{col}"] = [str(bpath), ""]
            new_entries.append(
                FileEntry(
                    e.path,
                    e.rows,
                    stats,
                    e.added,
                    e.bytes,
                    data_change=e.data_change,
                    dv=e.dv,
                )
            )
        self._publish(version, new_entries)
        return version

    def read_bloom_pruned(
        self,
        spark: SparkSession,
        col: str,
        value: int,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Point-lookup scan keeping only the files whose bloom for
        ``col`` might contain ``value`` — a superset guarantee exactly
        like stats pruning (the caller still applies the row filter);
        files without a bloom sidecar are conservatively kept."""
        entries = self.manifest(version)
        keep = []
        for e in entries:
            ref = e.stats.get(f"__bloom__{col}")
            if not ref:
                keep.append(e)
                continue
            doc = json.loads(Path(ref[0]).read_text())
            bits = set(doc["bits"])
            m = doc["m"]
            hits = all(
                ((value * h) % (1 << 32)) & (m - 1) in bits
                for h in self.BLOOM_HASHES
            )
            if hits:
                keep.append(e)
        if not keep:
            # bloom proved absence everywhere: empty frame with the
            # SAME merged schema every other read path produces (not
            # entries[0] alone, which after schema evolution would be
            # missing columns added in later commits)
            return (
                spark.read.option("mergeSchema", "true")
                .parquet(*[e.path for e in entries])
                .limit(0),
                0,
                len(entries),
            )
        return (
            spark.read.option("mergeSchema", "true").parquet(
                *[e.path for e in keep]
            ),
            len(keep),
            len(entries),
        )

    def streaming_sink(
        self,
        app_id: str,
        stats_cols: tuple[str, ...] = (),
        num_files: int | None = None,
        range_by: str | None = None,
    ):
        """An exactly-once ``foreachBatch`` function for this table:
        ``df.writeStream.foreachBatch(table.streaming_sink("job42"))``.

        Structured Streaming's contract is at-least-once per
        micro-batch — after a crash the last batch is REPLAYED with the
        same ``batch_id``. The sink forwards each batch to
        ``commit_append(txn=(app_id, batch_id))``, so the replayed
        commit is a no-op (the snapshot's txn watermark already covers
        it) and the lake holds every row exactly once — the public
        Delta idempotent-writes pattern (``txnAppId``/``txnVersion``).
        """

        def _sink(df: DataFrame, batch_id: int) -> None:
            self.commit_append(
                df,
                stats_cols=stats_cols,
                num_files=num_files,
                range_by=range_by,
                txn=(app_id, int(batch_id)),
            )

        return _sink

    def replace_where(
        self,
        spark: SparkSession,
        col: str,
        lo: Any,
        hi: Any,
        df: DataFrame,
        stats_cols: tuple[str, ...] = (),
        expected_parent: int | None = None,
    ) -> int:
        """Atomic range overwrite (Delta's ``replaceWhere``): in ONE
        commit, drop every existing row with ``col`` in [lo, hi) and
        insert ``df``'s rows instead — the backfill/restatement shape
        (recompute one day/month and swap it in, readers never see a
        gap). ``df`` is VALIDATED to lie inside the range first; rows
        outside raise rather than silently widening the overwrite.

        Stats-guided like delete_where: only files whose [min,max]
        overlap [lo, hi) are rewritten (their out-of-range rows are
        carried over); untouched files keep their paths. Publishes
        with ``data_change=True``. Returns the new version.
        """
        in_range = (F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi))
        if df.filter(~in_range).limit(1).count() > 0:
            raise ValueError(
                f"replacement rows fall outside [{lo!r}, {hi!r}) on {col!r}"
            )
        parent = (
            self.current_version
            if expected_parent is None
            else expected_parent
        )
        entries = self.manifest(parent)
        touched = _overlapping(entries, col, lo, hi)
        version = parent + 1
        out = self.data_dir / f"v{version}"
        if touched:
            carried = spark.read.option("mergeSchema", "true").parquet(
                *[e.path for e in touched]
            ).filter(~in_range)
            new_data = carried.unionByName(df, allowMissingColumns=True)
        else:
            new_data = df
        new_data.write.mode("overwrite").parquet(str(out))
        new_entries = [
            self._file_entry(p, stats_cols, version)
            for p in sorted(out.glob("*.parquet"))
        ]
        new_entries = [e for e in new_entries if e.rows > 0]
        removed = {e.path for e in touched}
        kept = [e for e in entries if e.path not in removed]
        self._publish(version, kept + new_entries)
        return version

    def vacuum_plan(
        self, retain_last: int = 1
    ) -> list[tuple[int, int, int]]:
        """Dry-run of ``vacuum``: per commit version that ADDED files
        no retained snapshot still references, (added_version,
        n_files_reclaimable, n_rows_reclaimable). Metadata-only (the
        manifests carry per-file row counts), so the retention
        decision is auditable before any file is unlinked — the
        storage-reclamation dashboard every lakehouse runs ahead of
        its vacuum job. Each reclaimable file counts exactly once, at
        the version that added it."""
        vs = self.versions()
        keep_vs = set(vs[-retain_last:]) if retain_last > 0 else set()
        live: set[str] = set()
        for v in keep_vs:
            live.update(e.path for e in self.manifest(v))
        seen: set[str] = set()
        by_added: dict[int, list[int]] = {}
        for v in vs:
            if v in keep_vs:
                continue
            for e in self.manifest(v):
                if e.path not in live and e.path not in seen:
                    seen.add(e.path)
                    by_added.setdefault(e.added, []).append(e.rows)
        return [
            (added, len(rows), sum(rows))
            for added, rows in sorted(by_added.items())
        ]

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Expire all snapshots older than the newest ``retain_last``
        and delete data files no retained snapshot references. Returns
        the deleted paths. Time travel to expired versions fails
        loudly afterwards (the log entry is gone, not just the data).
        """
        vs = self.versions()
        keep_vs = set(vs[-retain_last:]) if retain_last > 0 else set()
        live: set[str] = set()
        for v in keep_vs:
            live.update(e.path for e in self.manifest(v))
        deleted: list[str] = []
        for v in vs:
            if v not in keep_vs:
                for e in self.manifest(v):
                    if e.path not in live and os.path.exists(e.path):
                        os.remove(e.path)
                        deleted.append(e.path)
                (self.log_dir / f"v{v}.json").unlink()
        return deleted

    def clone_shallow(self, target_root: str | os.PathLike) -> "LakeTable":
        """ZERO-COPY shallow clone (the public Delta ``SHALLOW CLONE``
        shape): publish a fresh table at ``target_root`` whose v1
        manifest references THIS table's current data files by absolute
        path — no bytes are copied, no files rewritten. The clone reads
        identically to the source snapshot it was taken from, and its
        own future commits never touch the source's files (new data
        lands under the clone's root; the shared files are
        copy-on-reference). The caveat every lakehouse documents applies
        here too: vacuuming the SOURCE can delete files the clone still
        references — clone lifecycle must outlive source retention.

        Scale: O(files) manifest JSON on the driver, zero data I/O —
        cloning a 100 TB table costs the same as cloning a 100 MB one.
        """
        clone = LakeTable(target_root)
        if clone.versions():
            raise ValueError(
                f"clone target {clone.root} already has a snapshot log"
            )
        entries = [
            FileEntry(
                e.path,
                e.rows,
                dict(e.stats),
                1,  # everything is "added" at the clone's v1
                e.bytes,
                data_change=False,  # a clone changes no data
                dv=e.dv,
            )
            for e in self.manifest()
        ]
        clone._publish(1, entries, dict(self.txns()))
        return clone

    # --- read --------------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        entries = self.manifest(version)
        if not entries:
            raise ValueError("empty table (no committed snapshot)")
        # mergeSchema: commits may evolve the schema (add columns);
        # the merged read fills missing columns with NULL — footer-read
        # cost only, metadata-scale
        dv_entries = [e for e in entries if e.dv]
        plain = [e for e in entries if not e.dv]
        if not dv_entries:
            return spark.read.option("mergeSchema", "true").parquet(
                *[e.path for e in entries]
            )
        # merge-on-read: files carrying a delete vector pay a broadcast
        # anti-join on (source file, key) — each sidecar drops its keys
        # from ITS file only (the FileEntry.dv contract, and the same
        # per-file semantics compact_dv applies, so the MOR view and
        # the post-compaction view agree even when key_col is not
        # globally unique); every other file streams through untouched
        # (the Iceberg equality-delete read path, deletes file-scoped)
        key_cols, pairs = set(), []
        for e in dv_entries:
            doc = json.loads(Path(e.dv).read_text())
            key_cols.add(doc["key_col"])
            pairs.extend((e.path, k) for k in doc["keys"])
        if len(key_cols) != 1:
            raise ValueError(f"mixed DV key columns: {sorted(key_cols)}")
        key_col = key_cols.pop()
        scan_dv = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in dv_entries]
        )
        key_df = spark.createDataFrame(
            pairs,
            f"__dv_file string, "
            f"{key_col} {scan_dv.schema[key_col].dataType.simpleString()}",
        )
        surv = (
            scan_dv.withColumn("__dv_file", F.expr(_FILE_EXPR))
            .join(F.broadcast(key_df), ["__dv_file", key_col], "left_anti")
            .drop("__dv_file")
        )
        if not plain:
            return surv
        scan_plain = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in plain]
        )
        return scan_plain.unionByName(surv, allowMissingColumns=True)

    def incremental(
        self,
        spark: SparkSession,
        since_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Files ADDED in (since_version, to_version] — the CDC feed a
        downstream consumer reads instead of diffing snapshots."""
        to_v = self.current_version if to_version is None else to_version
        paths = [
            e.path
            for e in self.manifest(to_v)
            if since_version < e.added <= to_v and e.data_change
        ]
        if not paths:
            raise ValueError(
                f"no files added in ({since_version}, {to_v}]"
            )
        return spark.read.parquet(*paths)

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo: Any,
        hi: Any,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Manifest-stats pruning: keep only files whose [min,max] for
        ``col`` can overlap [lo, hi]; returns (df, files_read,
        files_total). The caller still applies the row-level residual
        filter — pruning is a superset guarantee, exactly like parquet
        row-group skipping one level up.
        """
        entries = self.manifest(version)
        lo_s, hi_s = _ser(lo), _ser(hi)
        keep = [
            e
            for e in entries
            if col not in e.stats
            or not (e.stats[col][0] > hi_s or e.stats[col][1] < lo_s)
        ]
        if not keep:
            raise ValueError("predicate prunes every file")
        df = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in keep]
        )
        return df, len(keep), len(entries)

    def change_feed(
        self,
        spark: SparkSession,
        key_col: str,
        since_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Row-level change feed between two snapshots (Delta CDF /
        Iceberg changelog shape), computed from the MANIFEST file-set
        diff — never a full snapshot diff:

        1. removed = files in the ``since`` manifest but not the ``to``
           manifest; added = the reverse. Files in BOTH manifests are
           untouched by construction (copy-on-write never edits a file
           in place) and are never read.
        2. full-outer-join removed-rows vs added-rows on ``key_col``;
           carried-over rows (identical on every column, the
           copy-on-write rewrite tax and any compaction in the range)
           cancel under a null-safe struct compare and are dropped.
        3. classify the rest: key only on the old side -> ``delete``;
           only on the new side -> ``insert``; both sides, values
           differ -> ``update_post`` (new image emitted).

        Net semantics across the range (insert-then-delete = nothing),
        exactly snapshot-diff semantics but reading only changed files:
        at 100 TB a daily feed over key-clustered commits reads the
        day's touched files, not the table. The join shuffles only
        changed rows; a merge-on-read engine would serve this from
        deletion vectors — with copy-on-write the file diff IS the
        change log. Returns the changed rows (new image, old image for
        deletes) plus ``_change_type``.
        """
        to_v = self.current_version if to_version is None else to_version
        old_paths = {e.path for e in self.manifest(since_version)}
        new_paths = {e.path for e in self.manifest(to_v)}
        added = sorted(new_paths - old_paths)
        removed = sorted(old_paths - new_paths)

        def _read(paths: list[str]) -> DataFrame | None:
            if not paths:
                return None
            return spark.read.option("mergeSchema", "true").parquet(*paths)

        old_df, new_df = _read(removed), _read(added)
        if old_df is None and new_df is None:  # no data change in range
            base = self.read(spark, to_v).limit(0)
            return base.withColumn("_change_type", F.lit(""))
        if old_df is None:
            return new_df.withColumn("_change_type", F.lit("insert"))
        if new_df is None:
            return old_df.withColumn("_change_type", F.lit("delete"))

        cols = new_df.columns  # newest schema wins (additive evolution)
        for c in cols:
            if c not in old_df.columns:
                old_df = old_df.withColumn(c, F.lit(None))
        o = old_df.select(*cols).alias("o")
        n = new_df.select(*cols).alias("n")
        joined = o.join(
            n, F.col(f"o.{key_col}") == F.col(f"n.{key_col}"), "full_outer"
        )
        is_delete = F.col(f"n.{key_col}").isNull()
        is_insert = F.col(f"o.{key_col}").isNull()
        unchanged = F.struct(*[F.col(f"o.{c}") for c in cols]).eqNullSafe(
            F.struct(*[F.col(f"n.{c}") for c in cols])
        )
        change = (
            F.when(is_delete, F.lit("delete"))
            .when(is_insert, F.lit("insert"))
            .when(unchanged, F.lit(None))
            .otherwise(F.lit("update_post"))
        )
        picked = [
            F.when(is_delete, F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
            for c in cols
        ]
        return (
            joined.select(*picked, change.alias("_change_type"))
            .filter(F.col("_change_type").isNotNull())
        )
