"""Snapshot/manifest table format — Iceberg semantics over plain parquet.

SURVEY §1.3 / BASELINE name Iceberg as the checkpoint + metrics table
format; the sandbox has no Iceberg runtime (no network, no extra jars),
so the engine implements the SEMANTICS the north rule actually depends
on — atomic commits, append isolation, snapshot time travel, manifest-
tracked file lists with per-file lineage — directly over the parquet
files Spark already writes. On a cluster with Iceberg available the
``Checkpointer(fmt="iceberg")`` path is a config change; this module is
the in-sandbox equivalent AND the documented fallback for object stores
without a catalog service.

Design (a deliberately minimal subset of the Iceberg spec):

    <table>/
      VERSION                 current snapshot id (atomic os.replace swap
                              — the single commit point, like Iceberg's
                              version-hint/catalog pointer)
      snapshots/v<N>.json     snapshot manifest: operation, parent,
                              schema, and the EXPLICIT data-file list
                              with per-file row counts + content hashes
                              (per-partition lineage at file granularity)
      data/c<uuid>/part-*.parquet   one directory per commit; files are
                              immutable once written, never rewritten

Guarantees (each pinned by a test):

- **Atomicity**: data files + snapshot json are staged first; the table
  only advances when VERSION is atomically replaced. A writer dying at
  any earlier point leaves the previous snapshot fully readable (its
  file list never references the orphaned files).
- **Append isolation**: ``write(mode="append")`` adds a snapshot whose
  file list is parent's + new — parent files are never touched, so a
  concurrent reader of snapshot N (e.g. the J6 resume anti-join reading
  ``locations`` while the same run appends to it) is unaffected.
- **Time travel**: ``read(version=N)`` reads the exact historical file
  list; ``history()`` lists snapshots.
- **Optimistic concurrency**: commit re-checks VERSION before the swap
  and raises ``CommitConflict`` if another writer advanced it (the
  Iceberg retry contract; the caller re-runs its commit).
- **Explicit file lists**: readers never glob the directory — orphaned
  files from failed commits are invisible until ``vacuum()`` removes
  them.

Scale notes: snapshots are driver-side JSON of O(files) entries — the
small side (a 10^12-row table at 512 MB/file is ~10^5 entries, a few MB
of manifest). Per-file lineage is computed in ONE distributed pass over
the just-written files (groupBy input_file_name, map-side combined);
the data path stays whatever Spark wrote — no extra copy, no rewrite.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class CommitConflict(RuntimeError):
    """Another writer advanced the table between load and commit."""


def _json_scalar(v):
    """JSON-safe stat value (timestamps → isoformat strings; the
    comparison semantics survive because isoformat sorts like time)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _file_lineage(
    spark: SparkSession, files: list[str], stats_cols: list[str] | None = None
) -> list[dict]:
    """Per-file (rows, content_hash[, column min/max stats]) in one
    distributed pass.

    Hash formula matches plans.pipeline.content_hash per file:
    sum(xxhash64(cols) % 2^31) xor row-count — order-insensitive, and
    per-file sums add up to the whole-table sum so table-level hashes
    are derivable from the manifest without re-reading data.

    ``stats_cols`` adds per-file min/max for those columns to the same
    aggregation (no extra pass) — the manifest-level pruning statistics
    Iceberg keeps in its data-file entries.
    """
    if not files:
        return []
    df = spark.read.parquet(*files)
    cols = [F.col(c).cast("string") for c in df.columns]
    aggs = [
        F.count("*").alias("rows"),
        F.coalesce(F.sum(F.col("h") % F.lit(2**31)), F.lit(0)).alias("s"),
    ]
    for c in stats_cols or []:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = (
        df.select(
            F.input_file_name().alias("f"),
            F.xxhash64(*cols).alias("h"),
            *(stats_cols or []),
        )
        .groupBy("f")
        .agg(*aggs)
        .collect()
    )
    by_name = {}
    for r in rows:
        # input_file_name is a file:/ URI; key by basename-within-commit
        # (commit dirs are unique, basenames unique within one).
        by_name[os.path.basename(r["f"])] = r
    out = []
    for f in files:
        r = by_name.get(os.path.basename(f))
        if r is None:  # zero-row part file: no rows reached the agg
            entry = {"path": f, "rows": 0, "content_hash": 0}
        else:
            entry = {
                "path": f,
                "rows": int(r["rows"]),
                "content_hash": int(r["s"]) ^ int(r["rows"]),
            }
            if stats_cols:
                entry["stats"] = {
                    c: [
                        _json_scalar(r[f"__min_{c}"]),
                        _json_scalar(r[f"__max_{c}"]),
                    ]
                    for c in stats_cols
                }
        out.append(entry)
    return out


class ManifestTable:
    """One snapshot-versioned table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- pointer ----------------------------------------------------------

    def _version_file(self) -> str:
        return os.path.join(self.path, "VERSION")

    def current_version(self) -> int | None:
        try:
            with open(self._version_file()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.path, "snapshots", f"v{version:012d}.json")

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        with open(self._snapshot_path(v)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """All snapshots, ascending version (summary fields only)."""
        v = self.current_version()
        out = []
        for i in range(1, (v or 0) + 1):
            try:
                s = self.snapshot(i)
            except FileNotFoundError:
                continue  # manifest expired by vacuum(); version retired
            out.append(
                {
                    "version": s["version"],
                    "parent": s["parent"],
                    "operation": s["operation"],
                    "ts": s["ts"],
                    "total_rows": s["summary"]["total_rows"],
                    "total_files": s["summary"]["total_files"],
                    "content_hash": s["summary"]["content_hash"],
                }
            )
        return out

    def lineage(self, version: int | None = None) -> list[dict]:
        """Per-file lineage entries of a snapshot (path, rows, hash)."""
        return self.snapshot(version)["files"]

    def table_hash(self, version: int | None = None) -> int:
        """Partition-invariant whole-table content hash derived from
        the manifest alone (plans.pipeline.content_hash formula:
        sum of per-row xxhash64 % 2^31, xor total rows). Identical
        across any file layout of the same rows — the invariant
        compact() preserves — unlike the snapshot summary's
        xor-of-files fingerprint, which identifies a specific layout.
        """
        entries = self.snapshot(version)["files"]
        return _entry_sum(entries) ^ sum(e["rows"] for e in entries)

    # -- commit -----------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        stats_cols: list[str] | None = None,
    ) -> None:
        """Commit ``df`` as a new snapshot (``overwrite`` or ``append``).

        Stage order is the atomicity contract: (1) data files into a
        fresh commit dir, (2) one lineage pass over exactly those
        files, (3) snapshot json, (4) atomic VERSION swap. Failure
        before (4) leaves the table at its previous snapshot with only
        unreferenced orphans on disk.

        ``stats_cols``: record per-file min/max of these columns in the
        manifest (Iceberg data-file stats) so ``read_where`` can prune
        files at PLANNING time. Stats only help if the writer clusters
        the data (e.g. ``df.repartitionByRange(n, col)`` or the Morton
        sort of sources/clustered.py) — unclustered files all span the
        full range and nothing prunes.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        base_version = self.current_version()
        commit_dir = os.path.join(self.path, "data", f"c{uuid.uuid4().hex}")
        df.write.parquet(commit_dir)
        new_files = sorted(
            os.path.join(commit_dir, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        if stats_cols:
            entries = _file_lineage(self.spark, new_files, stats_cols)
        else:
            entries = _file_lineage(self.spark, new_files)
        if mode == "append" and base_version is not None:
            parent = self.snapshot(base_version)
            entries = parent["files"] + entries
            schema_json = parent["schema"]
        else:
            schema_json = json.loads(df.schema.json())
        self._commit_snapshot(entries, schema_json, mode, base_version)

    def _commit_snapshot(
        self,
        entries: list[dict],
        schema_json: dict,
        operation: str,
        base_version: int | None,
    ) -> int:
        """Shared commit tail: snapshot json assembly, O_EXCL claim,
        VERSION swap — the atomicity/optimistic-concurrency contract
        for every snapshot-producing operation (write / merge)."""
        version = (base_version or 0) + 1
        snap = {
            "version": version,
            "parent": base_version,
            "operation": operation,
            "ts": time.time(),
            "schema": schema_json,
            "files": entries,
            "summary": {
                "total_rows": sum(e["rows"] for e in entries),
                "total_files": len(entries),
                # xor-of-per-file-hashes: order-insensitive whole-table
                # fingerprint, recomputable from the manifest alone.
                "content_hash": _xor([e["content_hash"] for e in entries]),
            },
        }
        os.makedirs(os.path.join(self.path, "snapshots"), exist_ok=True)
        # Optimistic concurrency: CLAIMING the snapshot path is the atomic
        # step. O_EXCL create means two writers racing from the same base
        # version cannot both write v{N+1}.json — the loser gets
        # FileExistsError → CommitConflict and never clobbers the winner's
        # committed manifest. (Posix open(O_CREAT|O_EXCL) is atomic; this
        # is the filesystem equivalent of Iceberg's catalog CAS.)
        # A writer that CRASHES between this claim and the VERSION swap
        # leaves an orphan claim that wedges future commits with
        # CommitConflict; that is resolved by the explicit recover()
        # (operator action), never automatically here — an orphan is
        # indistinguishable from a live writer mid-swap.
        try:
            fh = open(self._snapshot_path(version), "x")
        except FileExistsError:
            raise CommitConflict(
                f"{self.path}: snapshot v{version} already claimed by a "
                f"concurrent writer (base was {base_version})"
            ) from None
        with fh:
            json.dump(snap, fh)
        # Belt-and-braces re-check (covers a concurrent writer that won a
        # DIFFERENT version number, e.g. overwrite racing append). Release
        # the claimed manifest so the version number stays claimable.
        if self.current_version() != base_version:
            try:
                os.remove(self._snapshot_path(version))
            except FileNotFoundError:
                pass
            raise CommitConflict(
                f"{self.path}: version advanced past {base_version} during commit"
            )
        tmp = self._version_file() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._version_file())
        return version

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        when_matched: str = "update",
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Copy-on-write MERGE INTO (the Iceberg COW contract):
        rows of the current snapshot whose ``on`` key appears in
        ``source`` are replaced by the source row (``update``) or
        removed (``delete``); unmatched source rows are inserted
        (``update`` mode only).

        Only the AFFECTED files are rewritten: a key-semi-join over
        ``input_file_name()`` identifies which data files contain a
        matched key (broadcasting the distinct source keys — at scale
        the source of a MERGE is the small side), every other file is
        carried into the new snapshot untouched. The rewrite reads the
        affected files only, drops matched rows with one anti-join,
        unions the source, and commits through the same O_EXCL
        claim + VERSION swap as write() — a concurrent reader of the
        previous snapshot never observes a half-merged table.

        Returns a summary dict (committed version, files rewritten /
        carried, rows before/after). Raises ``CommitConflict`` under
        the standard optimistic-concurrency contract.
        """
        if when_matched not in ("update", "delete"):
            raise ValueError(
                f"when_matched must be update|delete, got {when_matched!r}"
            )
        base_version = self.current_version()
        if base_version is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        parent = self.snapshot(base_version)
        schema = StructType.fromJson(parent["schema"])
        if when_matched == "update" and set(source.columns) != {
            f.name for f in schema.fields
        }:
            raise ValueError(
                "merge source columns must match the table schema: "
                f"{sorted(source.columns)} vs "
                f"{sorted(f.name for f in schema.fields)}"
            )
        src_keys = source.select(*on).distinct().persist()
        try:
            cur = self.read(base_version)
            hit = (
                cur.select(*on, F.input_file_name().alias("__f"))
                .join(F.broadcast(src_keys), on, "left_semi")
                .select("__f")
                .distinct()
                .collect()
            )
            hit_names = {os.path.basename(r["__f"]) for r in hit}
            affected = [
                e
                for e in parent["files"]
                if os.path.basename(e["path"]) in hit_names
            ]
            carried = [
                e
                for e in parent["files"]
                if os.path.basename(e["path"]) not in hit_names
            ]
            aff_paths = [e["path"] for e in affected]
            if aff_paths:
                old_rows = self.spark.read.schema(schema).parquet(*aff_paths)
                kept_rows = old_rows.join(F.broadcast(src_keys), on, "left_anti")
            else:
                kept_rows = self.spark.createDataFrame([], schema)
            if when_matched == "update":
                new_data = kept_rows.unionByName(source)
            else:
                new_data = kept_rows
            commit_dir = os.path.join(
                self.path, "data", f"c{uuid.uuid4().hex}"
            )
            new_data.write.parquet(commit_dir)
            new_files = sorted(
                os.path.join(commit_dir, f)
                for f in os.listdir(commit_dir)
                if f.endswith(".parquet")
            )
            new_entries = _file_lineage(self.spark, new_files, stats_cols)
        finally:
            src_keys.unpersist(blocking=False)
        entries = carried + new_entries
        version = self._commit_snapshot(
            entries, parent["schema"], "merge", base_version
        )
        return {
            "version": version,
            "files_rewritten": len(affected),
            "files_carried": len(carried),
            "rows_before": parent["summary"]["total_rows"],
            "rows_after": sum(e["rows"] for e in entries),
        }

    def changes(self, from_version: int, to_version: int) -> DataFrame:
        """NET row-level changes between two snapshots (CDC read).

        File-diff first (manifest-only, driver-side): files present in
        ``to`` but not ``from`` are candidate inserts, the reverse are
        candidate deletes — identical carried files never get read.
        Because copy-on-write rewrites WHOLE files, rows carried
        through a rewrite would show up as delete+insert pairs in a
        naive file diff; the net pass cancels them with two full-row
        anti-joins over ONLY the differing files (cost bounded by
        churn, not table size). Result: the ``to`` schema plus a
        ``_change_type`` column (``insert`` | ``delete``) — an updated
        row appears as its old row deleted and its new row inserted,
        the standard COW changelog shape.

        Cancellation is SET-based (anti-join on the full row): if an
        identical row exists with different multiplicities on the two
        sides, the surplus copies are not reported. Merge-keyed tables
        are key-unique so this never triggers there; for multiset-
        exact diffs, aggregate a count per row first.
        """
        f_snap = self.snapshot(from_version)
        t_snap = self.snapshot(to_version)
        schema = StructType.fromJson(t_snap["schema"])
        f_paths = {e["path"] for e in f_snap["files"]}
        t_paths = {e["path"] for e in t_snap["files"]}
        added = sorted(t_paths - f_paths)
        removed = sorted(f_paths - t_paths)

        def _read(paths: list[str]) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(*paths)

        cols = [f.name for f in schema.fields]
        ins = _read(added)
        del_ = _read(removed)
        net_ins = ins.join(del_, cols, "left_anti").withColumn(
            "_change_type", F.lit("insert")
        )
        net_del = del_.join(ins, cols, "left_anti").withColumn(
            "_change_type", F.lit("delete")
        )
        return net_ins.unionByName(net_del)

    # -- read -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """DataFrame over a snapshot's EXPLICIT file list (never a
        directory glob — uncommitted/orphaned files are invisible)."""
        snap = self.snapshot(version)
        schema = StructType.fromJson(snap["schema"])
        files = [e["path"] for e in snap["files"]]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def plan_files(
        self, bounds: dict[str, tuple], version: int | None = None
    ) -> tuple[list[dict], int]:
        """Manifest-level scan planning: the snapshot's file entries
        whose recorded min/max stats intersect EVERY ``col: (lo, hi)``
        bound (None end = unbounded). Files without stats for a bound
        column are conservatively kept. Returns (kept_entries,
        total_files) — driver-side over O(files) JSON, no data touched.
        """
        entries = self.snapshot(version)["files"]
        kept = []
        for e in entries:
            stats = e.get("stats", {})
            keep = True
            for c, (lo, hi) in bounds.items():
                if c not in stats:
                    continue  # no stats recorded — cannot exclude
                mn, mx = stats[c]
                if mn is None or mx is None:
                    continue  # all-null file chunk — cannot exclude
                if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    keep = False
                    break
            if keep:
                kept.append(e)
        return kept, len(entries)

    def read_where(
        self, bounds: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Read a snapshot touching only files whose manifest stats can
        satisfy ``bounds``, then apply the residual range predicates
        exactly. The Iceberg scan-planning contract: file skipping is
        decided from the manifest alone, BEFORE Spark lists or opens
        anything."""
        snap = self.snapshot(version)
        schema = StructType.fromJson(snap["schema"])
        kept, _total = self.plan_files(bounds, version)
        files = [e["path"] for e in kept]
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*files)
        for c, (lo, hi) in bounds.items():
            if lo is not None:
                df = df.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(c) <= F.lit(hi))
        return df

    # -- maintenance ------------------------------------------------------

    def compact(
        self,
        small_file_rows: int = 100_000,
        target_file_rows: int = 1_000_000,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Bin-pack small data files into ~``target_file_rows`` files
        (the Iceberg ``rewrite_data_files`` maintenance action).

        The small-file problem is the canonical failure mode of a
        long-lived append/merge table at scale: 10^5 trickle commits
        leave 10^5 tiny files, and every scan pays per-file open cost.
        Compaction reads ONLY the files below ``small_file_rows``
        (selected driver-side from the manifest — no data touched to
        plan), rewrites them as ceil(total_rows / target) files, and
        commits a ``compact`` snapshot carrying every large file
        untouched. Data is bit-identical by construction; the
        order-insensitive ``content_hash`` in the new snapshot summary
        must equal the parent's, and the commit VERIFIES that before
        publishing (a corrupted rewrite can never become current).

        Returns a summary dict; no-op (returns with ``compacted: 0``,
        no new snapshot) when fewer than two small files exist.
        """
        base_version = self.current_version()
        if base_version is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        parent = self.snapshot(base_version)
        small = [e for e in parent["files"] if e["rows"] < small_file_rows]
        large = [e for e in parent["files"] if e["rows"] >= small_file_rows]
        if len(small) < 2:
            return {"version": base_version, "compacted": 0, "written": 0}
        schema = StructType.fromJson(parent["schema"])
        total = sum(e["rows"] for e in small)
        n_out = max(1, -(-total // target_file_rows))
        commit_dir = os.path.join(self.path, "data", f"c{uuid.uuid4().hex}")
        (
            self.spark.read.schema(schema)
            .parquet(*[e["path"] for e in small])
            .repartition(n_out)
            .write.parquet(commit_dir)
        )
        new_files = sorted(
            os.path.join(commit_dir, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        new_entries = _file_lineage(self.spark, new_files, stats_cols)
        # Partition-INVARIANT equality check: per-file sums (recovered
        # as content_hash ^ rows) add across any file grouping, unlike
        # the summary's xor-of-files fingerprint which identifies a
        # specific file layout.
        if _entry_sum(new_entries) != _entry_sum(small) or sum(
            e["rows"] for e in new_entries
        ) != total:
            raise RuntimeError(
                f"{self.path}: compaction rewrite does not match its "
                "inputs (hash/rowcount drift) — aborting before commit; "
                "orphan files will be removed by vacuum()"
            )
        version = self._commit_snapshot(
            large + new_entries, parent["schema"], "compact", base_version
        )
        return {
            "version": version,
            "compacted": len(small),
            "written": len(new_entries),
        }

    def recover(self) -> str:
        """Repair an interrupted commit (OPERATOR action — run only
        when no writer is live).

        A writer that crashes between claiming ``v{N+1}.json`` (the
        atomic O_EXCL create) and swapping VERSION leaves an orphan
        claim: every future write computes the same version, hits
        FileExistsError and raises CommitConflict — the table is
        wedged until the orphan is resolved. write() deliberately does
        NOT auto-resolve (a claim indistinguishable from a LIVE
        writer mid-swap must not be deleted — that would re-introduce
        the clobber race the O_EXCL claim exists to prevent); with the
        no-live-writer precondition asserted by the caller, recovery
        is unambiguous:

        - orphan manifest parses complete and consistent → the crash
          happened AFTER the manifest was durably written: ROLL
          FORWARD (point VERSION at it — its data files were written
          before commit). Returns ``"rolled_forward"``.
        - orphan unreadable/inconsistent (crash mid-json.dump) →
          ROLL BACK (delete the claim). Returns ``"rolled_back"``.
        - no orphan → ``"clean"``.
        """
        v = self.current_version()
        nxt = (v or 0) + 1
        path = self._snapshot_path(nxt)
        if not os.path.exists(path):
            return "clean"
        try:
            with open(path) as fh:
                snap = json.load(fh)
            ok = (
                snap.get("version") == nxt
                and snap.get("parent") == v
                and isinstance(snap.get("files"), list)
                and "schema" in snap
            )
        except (json.JSONDecodeError, OSError):
            ok = False
        if not ok:
            os.remove(path)
            return "rolled_back"
        tmp = self._version_file() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(nxt))
        os.replace(tmp, self._version_file())
        return "rolled_forward"

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data files unreferenced by the ``keep_last`` newest
        snapshots (incl. orphans from failed commits) and drop expired
        snapshot manifests. Returns deleted file paths."""
        v = self.current_version()
        if v is None:
            return []
        keep_versions = set(range(max(1, v - keep_last + 1), v + 1))
        live = set()
        for kv in keep_versions:
            live.update(e["path"] for e in self.snapshot(kv)["files"])
        deleted = []
        data_root = os.path.join(self.path, "data")
        for commit in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            cdir = os.path.join(data_root, commit)
            for f in sorted(os.listdir(cdir)):
                p = os.path.join(cdir, f)
                if f.endswith(".parquet") and p not in live:
                    os.remove(p)
                    deleted.append(p)
                elif not f.endswith(".parquet") and p not in live:
                    os.remove(p)  # _SUCCESS / .crc markers
            if not os.listdir(cdir):
                os.rmdir(cdir)
        for old in range(1, v + 1):
            if old not in keep_versions:
                try:
                    os.remove(self._snapshot_path(old))
                except FileNotFoundError:
                    pass
        return deleted


def _entry_sum(entries: list[dict]) -> int:
    """Sum of per-file row-hash sums (content_hash ^ rows recovers the
    file's sum term) — additive across any regrouping of the rows."""
    return sum(e["content_hash"] ^ e["rows"] for e in entries)


def _xor(vals: list[int]) -> int:
    out = 0
    for v in vals:
        out ^= v
    return out
