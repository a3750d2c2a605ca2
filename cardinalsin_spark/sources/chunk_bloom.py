"""Per-chunk Bloom-filter file pruning.

The reference README advertises per-chunk bloom filters next to its min/max
chunk stats, but the writer ships with them disabled (reference
``parquet writer``, SURVEY §1.4: "bloom filters *disabled in code*" — the
README claim is aspirational). This module ships the real thing on the
Spark side: a sidecar Bloom bitmap per data file over a point-lookup column
(default ``metric_name``), consulted before the scan so an equality probe
reads only the files that can contain the value.

Why not parquet's native column bloom? Spark can WRITE
``parquet.bloom.filter.enabled`` but its vectorized reader does not use
them for row-group skipping, and they sit inside the footer of every file —
the planner would still open every footer. The sidecar keeps the whole
index catalog-sized (``n_files × m_bits/8`` bytes, default 8 KiB per file)
in ONE object read by the driver at plan time — the same "stats in the
metadata store, not in the data files" shape as the reference's chunk
catalog (``metadata/catalog.rs``).

Guarantee: no false negatives (Bloom property) — pruning can only SKIP
files that provably lack the value; a final equality filter keeps results
exact under false positives. Hashing is Spark's ``xxhash64(value, seed)``
on both the build and probe paths, so there is no cross-language hash
drift to audit.

Scale shape: the build is one distinct-projection scan aggregated into
``≤ n_files · m_bits/64`` bitmap-word rows (catalog-sized — collected like
any other chunk-stats metadata, NOT data); probing runs one 1-row Spark
expression per lookup and a driver-side bit test over the sidecar.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDECAR = "_chunk_bloom.json"


class ChunkBloomIndex:
    def __init__(
        self,
        root: str,
        column: str = "metric_name",
        m_bits: int = 1 << 16,
        k_hashes: int = 5,
    ):
        self.root = root
        self.column = column
        self.m_bits = int(m_bits)
        self.k_hashes = int(k_hashes)
        self.path = os.path.join(root, _SIDECAR)

    @classmethod
    def open(cls, root: str) -> "ChunkBloomIndex":
        """Construct from an existing sidecar, ADOPTING its column and
        hash parameters (a prober must never guess them — a silent m/k
        mismatch would make every membership test garbage; the explicit
        constructor raises on mismatch, this never can)."""
        with open(os.path.join(root, _SIDECAR)) as f:
            body = json.load(f)
        return cls(
            root,
            column=body["column"],
            m_bits=body["m_bits"],
            k_hashes=body["k_hashes"],
        )

    # -- the table's live file set ------------------------------------------

    def _current_files(self) -> list[str]:
        """Relative paths of the table's CURRENT data files — the head
        manifest when the table is snapshot-managed (root listings miss
        underscore-hidden ``_data-v*`` compaction output and, after
        vacuum, include nothing stale), else a directory walk with
        Spark's own root-read visibility (``_``/``.`` paths skipped)."""
        snap_dir = os.path.join(self.root, "_snapshots")
        if os.path.isdir(snap_dir):
            from cardinalsin_spark.sources.snapshots import SnapshotCatalog

            cat = SnapshotCatalog(self.root)
            return sorted(
                os.path.relpath(p, self.root) for p in cat.files()
            )
        out = []
        for dirpath, dirnames, filenames in os.walk(self.root):
            dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
            for name in filenames:
                if name.endswith(".parquet") and not name.startswith((".", "_")):
                    out.append(
                        os.path.relpath(os.path.join(dirpath, name), self.root)
                    )
        return sorted(out)

    def _read_files(self, spark: SparkSession, rel_paths: list[str]) -> DataFrame:
        from cardinalsin_spark.sources.snapshots import read_parquet_grouped

        return read_parquet_grouped(
            spark, self.root, [os.path.join(self.root, p) for p in rel_paths]
        )

    # -- build -------------------------------------------------------------

    def build(self, spark: SparkSession) -> dict:
        """Scan the table once (distinct projection of (file, column)) and
        write the sidecar: ``{rel_file: {word_index: bits_hex}}`` plus the
        hash parameters, so a probe cannot silently use mismatched m/k.
        The scan covers exactly :meth:`_current_files` — on a
        snapshot-managed table that is the head manifest (including
        ``_data-v*`` compaction output a root read would skip), not a
        directory listing."""
        seeds = F.array(*[F.lit(i) for i in range(self.k_hashes)])
        rows = (
            self._read_files(spark, self._current_files())
            .select(
                F.input_file_name().alias("_f"),
                F.col(self.column).cast("string").alias("_k"),
            )
            .filter(F.col("_k").isNotNull())
            .distinct()
            .select("_f", F.explode(seeds).alias("_seed"), "_k")
            .select(
                "_f",
                F.pmod(F.xxhash64("_k", "_seed"), F.lit(self.m_bits)).alias(
                    "_pos"
                ),
            )
            .select(
                "_f",
                F.expr("_pos div 64").alias("word"),
                F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("bit"),
            )
            .groupBy("_f", "word")
            .agg(F.bit_or("bit").alias("bits"))
            .collect()  # catalog-sized: ≤ n_files · m_bits/64 word rows
        )
        files: dict[str, dict[str, str]] = {}
        for r in rows:
            rel = self._rel(r._f)
            files.setdefault(rel, {})[str(r.word)] = format(
                r.bits & 0xFFFFFFFFFFFFFFFF, "x"
            )
        body = {
            "column": self.column,
            "m_bits": self.m_bits,
            "k_hashes": self.k_hashes,
            "files": files,
            # the exact file set the build covered: lets a probe tell a
            # file that was indexed-but-all-null (prunable) apart from a
            # file ingested AFTER the build (must stay a candidate — the
            # no-false-negatives guarantee does not cover it)
            "indexed_files": self._current_files(),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(body, f)
        os.replace(tmp, self.path)
        return body

    def _rel(self, file_uri: str) -> str:
        # input_file_name() URIs vary: file:///abs, file:/abs, or bare /abs
        p = file_uri
        if p.startswith("file:"):
            p = p[5:]
            p = "/" + p.lstrip("/")
        return os.path.relpath(p, os.path.abspath(self.root))

    # -- probe -------------------------------------------------------------

    def _load(self) -> dict:
        with open(self.path) as f:
            body = json.load(f)
        if body["m_bits"] != self.m_bits or body["k_hashes"] != self.k_hashes:
            raise ValueError(
                "sidecar hash parameters differ from this index's "
                f"(sidecar m={body['m_bits']} k={body['k_hashes']}, "
                f"index m={self.m_bits} k={self.k_hashes}) — rebuild or "
                "construct the index with matching parameters"
            )
        if body["column"] != self.column:
            raise ValueError(
                f"sidecar indexes column {body['column']!r}, not "
                f"{self.column!r}"
            )
        return body

    def _positions(self, spark: SparkSession, value: str) -> list[int]:
        # same xxhash64 family as the build — evaluated by the same engine,
        # so there is no cross-language hash implementation to keep in sync
        exprs = [
            F.pmod(
                F.xxhash64(F.lit(value), F.lit(i)), F.lit(self.m_bits)
            ).alias(f"p{i}")
            for i in range(self.k_hashes)
        ]
        row = spark.range(1).select(*exprs).first()
        return [int(row[i]) for i in range(self.k_hashes)]

    def candidate_files(self, spark: SparkSession, value: str) -> list[str]:
        """Relative paths of every file that MAY contain ``value`` —
        guaranteed superset of the files that do, over the table's
        CURRENT file set:

        * a current file the build never saw (ingested / stream-landed /
          compacted-in after the sidecar was written) is ALWAYS a
          candidate — stale bloom bits must widen the scan, never narrow
          it past a real match;
        * a sidecar entry for a file no longer current (compacted away,
          vacuumed) is dropped — reading it would be wrong or fail;
        * an indexed file with no bits for the value is pruned, including
          the indexed-but-all-null case the explicit ``indexed_files``
          stamp distinguishes from never-indexed."""
        body = self._load()
        current = self._current_files()
        indexed = set(body.get("indexed_files", body["files"].keys()))
        pos = self._positions(spark, value)
        out = []
        for rel in current:
            if rel not in indexed:
                out.append(rel)  # post-build file: unconditional candidate
                continue
            words = body["files"].get(rel)
            if words is None:
                continue  # indexed, all-null column: cannot match equality
            ok = True
            for p in pos:
                bits = int(words.get(str(p // 64), "0"), 16)
                if not (bits >> (p % 64)) & 1:
                    ok = False
                    break
            if ok:
                out.append(rel)
        return sorted(out)

    def read_matching(self, spark: SparkSession, value: str) -> DataFrame:
        """Exact point-lookup read: scan only the candidate files (grouped
        by partition layout so ``date=``/``hour=`` columns survive and
        flat ``_data-v*`` compaction output unions in) and apply the
        equality filter — bloom false positives drop here, so the result
        is identical to a full-table filter over the current file set."""
        cands = self.candidate_files(spark, value)
        if not cands:
            current = self._current_files()
            if not current:
                raise FileNotFoundError(f"no data files under {self.root}")
            return (
                self._read_files(spark, current)
                .filter(F.col(self.column) == F.lit(value))
                .limit(0)
            )
        return self._read_files(spark, cands).filter(
            F.col(self.column) == F.lit(value)
        )
