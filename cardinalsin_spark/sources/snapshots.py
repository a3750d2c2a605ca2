"""Snapshot manifests: an atomic-swap chunk catalog for consistent reads.

The reference keeps its chunk catalog as a JSON object in S3 updated by
ETag compare-and-swap (``metadata/s3.rs:181-260``): a writer reads the
catalog + ETag, edits, and PUTs conditionally — losers retry. Readers always
see a complete catalog version, never a half-applied compaction.

The Spark-idiomatic equivalent is a Delta-style versioned manifest log:

* ``<root>/_snapshots/v{N:06d}.json`` — one immutable manifest per version,
  listing the data files that make up the table at that version.
* Commit is CAS by construction: the manifest is written to a temp file and
  ``os.link``-ed to its version name — creating version N+1 fails with
  ``SnapshotConflict`` if another writer got there first (the local-fs
  analog of the ETag-mismatch retry loop; on object storage this maps to a
  conditional PUT).
* Writers NEVER mutate data files in place: compaction writes new files,
  commits a manifest that references them, and leaves the old files on disk
  until ``vacuum`` drops versions outside the retention window. A reader
  pinned to version N therefore keeps a consistent view while any number of
  compactions commit N+1, N+2, …

Scale posture: manifests are metadata (one JSON entry per data file), all
manifest I/O is driver-side and catalog-sized; the data itself moves only
through ordinary distributed parquet read/write. A 100M-file table would
want manifest segmentation (Delta checkpoints) — noted, not needed at this
catalog's file counts (the reference's catalog is likewise one JSON object).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotConflict(Exception):
    """Another writer committed the same next version first (the ETag
    mismatch of ``metadata/s3.rs:215-241``). Re-read and retry."""


class SnapshotCatalog:
    """Versioned manifest log under ``<root>/_snapshots/``."""

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_snapshots")

    # -- manifest log -----------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, f"v{version:06d}.json")

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no snapshots under {self.dir}")
        with open(self._path(version)) as f:
            return json.load(f)

    def files(self, version: int | None = None) -> list[str]:
        """Absolute data-file paths of a snapshot."""
        m = self.manifest(version)
        return [os.path.join(self.root, p) for p in m["files"]]

    def commit(self, files: list[str], base_version: int | None) -> int:
        """CAS-commit a new manifest listing ``files`` (paths under root,
        stored relative). ``base_version`` must be the version the writer
        built on (None for the bootstrap commit); the commit fails with
        ``SnapshotConflict`` if that is no longer the head — either because
        the head moved or because the next version name already exists
        (two writers racing from the same base: the link is the lock)."""
        os.makedirs(self.dir, exist_ok=True)
        head = self.current_version()
        if head != base_version:
            raise SnapshotConflict(
                f"base version {base_version} is stale (head is {head})"
            )
        next_v = 0 if base_version is None else base_version + 1
        rel = sorted(os.path.relpath(p, self.root) for p in files)
        for p in rel:
            if p.startswith(".."):
                raise ValueError(f"data file {p!r} is outside the table root")
        body = {"version": next_v, "parent": base_version, "files": rel}
        tmp = self._path(next_v) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(body, f, indent=1)
        try:
            os.link(tmp, self._path(next_v))  # atomic; EEXIST = lost race
        except FileExistsError:
            raise SnapshotConflict(
                f"version {next_v} was committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)
        return next_v

    # -- table operations -------------------------------------------------

    def _list_parquet(self, path: str) -> list[str]:
        out = []
        for dirpath, dirnames, filenames in os.walk(path):
            # skip the manifest dir and underscore-staged temp dirs,
            # mirroring Spark's own `_` path filtering
            dirnames[:] = [d for d in dirnames if not d.startswith("_")]
            for name in filenames:
                if name.endswith(".parquet") and not name.startswith((".", "_")):
                    out.append(os.path.join(dirpath, name))
        return sorted(out)

    def init_from_directory(self) -> int:
        """Bootstrap version 0 from the parquet files already under root
        (the migration path for a table that predates the manifest log)."""
        return self.commit(self._list_parquet(self.root), None)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a snapshot: exactly the manifest's file list, nothing else.
        Pinning ``version`` gives repeatable reads across concurrent
        compactions/appends; None follows the head."""
        return spark.read.parquet(*self.files(version))

    def append(self, new_files: list[str]) -> int:
        """Commit head + ``new_files`` (ingest). Retriable on conflict."""
        head = self.current_version()
        base = self.files(head) if head is not None else []
        return self.commit(base + list(new_files), head)

    def commit_new_files(self) -> int:
        """Post-ingest catalog registration (the reference's upload →
        catalog-register sequence, ``metadata/s3.rs:86-127``): diff the
        table directory against the head manifest and append any data
        files not yet referenced. Files a head manifest dropped (e.g. a
        compacted-away generation) are still on disk for pinned readers —
        they are NOT resurrected; only genuinely new paths are added."""
        listed = set(self._list_parquet(self.root))
        head = self.current_version()
        known: set[str] = set()
        for v in self.versions():
            known.update(self.files(v))
        new = sorted(listed - known)
        if not new:
            return head if head is not None else self.commit([], None)
        current = self.files(head) if head is not None else []
        return self.commit(current + new, head)

    def compact(
        self, spark: SparkSession, target_files: int = 1, ts_col: str = "timestamp"
    ) -> int:
        """Snapshot-aware chunk merge: read the head snapshot, rewrite it
        sorted into ``target_files`` files under a version-named data dir,
        and CAS-commit a manifest referencing ONLY the new files. Old files
        stay on disk for pinned readers until ``vacuum``; a conflict (or a
        crash before commit) leaves the table untouched — the new data dir
        is unreferenced garbage that the next compact attempt clears."""
        import shutil

        head = self.current_version()
        if head is None:
            raise FileNotFoundError("nothing to compact: no snapshots")
        next_v = head + 1
        out_dir = os.path.join(self.root, f"_staged-v{next_v:06d}")
        shutil.rmtree(out_dir, ignore_errors=True)
        (
            self.read(spark, head)
            .coalesce(target_files)
            .sortWithinPartitions(ts_col)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(out_dir)
        )
        final_dir = os.path.join(self.root, f"data-v{next_v:06d}")
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(out_dir, final_dir)
        try:
            return self.commit(self._list_parquet(final_dir), head)
        except SnapshotConflict:
            shutil.rmtree(final_dir, ignore_errors=True)
            raise

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data files no retained manifest references (the reference's
        GC-grace analog: files live until every retained snapshot stops
        referencing them). Returns the deleted data-file paths."""
        vs = self.versions()
        if len(vs) <= keep_last:
            return []
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self.files(v))
        doomed: set[str] = set()
        for v in drop:
            doomed.update(self.files(v))
        deleted = []
        for path in sorted(doomed - referenced):
            if os.path.exists(path):
                os.unlink(path)
                deleted.append(path)
        for v in drop:
            os.unlink(self._path(v))
        return deleted


def snapshot_chunk_stats(
    spark: SparkSession, catalog: SnapshotCatalog, version: int | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Chunk stats (catalog.chunk_stats shape) over one pinned snapshot —
    the compaction planner's input, consistent under concurrent commits."""
    from cardinalsin_spark.sources.catalog import chunk_stats  # noqa: F401

    df = catalog.read(spark, version)
    per_row = df.select(
        F.input_file_name().alias("chunk_path"),
        F.input_file_block_length().alias("_block_len"),
        F.col(ts_col).alias("_ts"),
    )
    return (
        per_row.groupBy("chunk_path")
        .agg(
            (F.min("_ts").cast("double") * 1e9).cast("long").alias("min_timestamp"),
            (F.max("_ts").cast("double") * 1e9).cast("long").alias("max_timestamp"),
            F.count(F.lit(1)).alias("row_count"),
            F.max("_block_len").alias("size_bytes"),
        )
        .withColumn("level", F.lit(0))
    )
