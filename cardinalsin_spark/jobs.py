"""Maintenance job CLI — the spark-submit-able counterpart of the
reference's compactor loop (``compactor/mod.rs``): compaction, retention,
downsampling over a metrics store.

    python -m cardinalsin_spark.jobs compact   --path /data/metrics
    python -m cardinalsin_spark.jobs retention --path /data/metrics --days 90
    python -m cardinalsin_spark.jobs downsample --path /data/metrics \
        --older-than-days 30 --resolution-s 300 --out /data/metrics_5m

No leases/locks needed: one Spark driver owns a job run (the reference's
lease protocol, ``metadata/s3.rs:1602-2058``, exists because many
single-node compactors race; a cluster scheduler serializes these instead).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    from cardinalsin_spark.operators.compaction import (
        compact_partition,
        downsample,
        l0_compaction_candidates,
        retention_candidates,
    )
    from cardinalsin_spark.session import get_spark
    from cardinalsin_spark.sources.catalog import chunk_stats

    p = argparse.ArgumentParser(prog="cardinalsin-jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compact", help="merge small files per hour partition")
    c.add_argument("--path", required=True)
    c.add_argument("--trigger-files", type=int, default=15)
    c.add_argument(
        "--max-partitions", type=int, default=None,
        help="compact at most N partitions this run (bounded job time)",
    )

    r = sub.add_parser("retention", help="list/drop partitions past retention")
    r.add_argument("--path", required=True)
    r.add_argument("--days", type=int, default=90)
    r.add_argument("--apply", action="store_true")

    d = sub.add_parser("downsample", help="rollup old data to coarser buckets")
    d.add_argument("--path", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--older-than-days", type=int, default=30)
    d.add_argument("--resolution-s", type=int, default=300)
    d.add_argument(
        "--no-counters",
        action="store_true",
        help="skip the counter-function moments (min_ts/first/last/inc) "
        "and their per-bucket sort — gauges-only rollups",
    )

    z = sub.add_parser(
        "zorder", help="rewrite a table Z-order-clustered on two columns"
    )
    z.add_argument("--path", required=True)
    z.add_argument("--out", required=True)
    z.add_argument("--cols", required=True,
                   help="two comma-separated columns, e.g. user_id,value")
    z.add_argument("--bits", type=int, default=16)
    z.add_argument("--target-files", type=int, default=None)

    bl = sub.add_parser(
        "bloom", help="(re)build the per-chunk Bloom pruning sidecar"
    )
    bl.add_argument("--path", required=True)
    bl.add_argument("--column", default="metric_name")
    bl.add_argument("--m-bits", type=int, default=1 << 16)
    bl.add_argument("--k-hashes", type=int, default=5)

    sc = sub.add_parser(
        "snapshot-compact",
        help="snapshot-aware chunk merge: rewrite the head manifest's "
        "files and CAS-commit a new version (pinned readers keep theirs)",
    )
    sc.add_argument("--path", required=True)
    sc.add_argument("--target-files", type=int, default=1)
    sc.add_argument("--ts-col", default="timestamp")
    sc.add_argument(
        "--retries", type=int, default=5,
        help="re-plan from the winner's head after a lost CAS race, up to "
        "N times (the reference compactor's retry loop)",
    )

    v = sub.add_parser(
        "vacuum",
        help="drop manifests past the retention window, delete "
        "unreferenced data files, reclaim crash-orphaned staging dirs",
    )
    v.add_argument("--path", required=True)
    v.add_argument("--keep-last", type=int, default=2)

    rr = sub.add_parser(
        "rollup-refresh",
        help="incrementally refresh a continuous-aggregate rollup of a "
        "snapshot-managed metrics table (bootstrap on first run; only "
        "files committed since the last refresh fold in)",
    )
    rr.add_argument("--path", required=True, help="snapshot-managed base table")
    rr.add_argument("--out", required=True, help="rollup table root")
    rr.add_argument("--resolution-s", type=int, default=300)
    rr.add_argument("--target-files", type=int, default=1)
    rr.add_argument("--retries", type=int, default=5)
    rr.add_argument(
        "--from-rollup",
        action="store_true",
        help="--path is itself a refresh_rollup table: cascade its "
        "moments to the coarser --resolution-s (hierarchical continuous "
        "aggregates; never rescans raw data)",
    )

    qs = sub.add_parser(
        "sketch-refresh",
        help="incrementally refresh a quantile-sketch continuous "
        "aggregate (log-bucketed, relative error <= alpha) of a "
        "snapshot-managed metrics table — the percentile tier for "
        "metrics never instrumented as histogram families",
    )
    qs.add_argument("--path", required=True, help="snapshot-managed base table")
    qs.add_argument("--out", required=True, help="sketch table root")
    qs.add_argument("--resolution-s", type=int, default=300)
    qs.add_argument("--alpha", type=float, default=0.01)
    qs.add_argument("--target-files", type=int, default=1)
    qs.add_argument("--retries", type=int, default=5)
    qs.add_argument(
        "--from-sketch",
        action="store_true",
        help="--path is itself a refresh_quantile_sketch table: cascade "
        "its slot counts to the coarser --resolution-s (hierarchical "
        "sketch tiers, EXACT — counts add; never rescans raw data)",
    )

    args = p.parse_args(argv)
    spark = get_spark(app_name=f"cardinalsin-{args.cmd}")

    import os as _os

    def _snapshot_managed(path: str) -> bool:
        return _os.path.isdir(_os.path.join(path, "_snapshots"))

    def _read_table(path: str):
        """Manifest-routed read when the table carries a snapshot log —
        a root directory read skips underscore-hidden `_data-v*`
        compaction output and would feed the job stale pre-compaction
        files (the point_lookup bug class, ADVICE r8)."""
        if _snapshot_managed(path):
            from cardinalsin_spark.sources.snapshots import SnapshotCatalog

            return SnapshotCatalog(path).read(spark)
        return spark.read.parquet(path)

    if args.cmd in ("compact", "retention") and _snapshot_managed(args.path):
        # these two operate on the Hive directory layout in place; on a
        # manifest-managed table they would rewrite/delete files that
        # pinned snapshots still reference — loud-reject to the
        # snapshot-native equivalents instead of corrupting the log
        print(
            f"{args.cmd}: {args.path} is snapshot-managed — use "
            "'snapshot-compact' (CAS rewrite) / 'vacuum' (retention + GC)"
        )
        return 2

    if args.cmd == "compact":
        import datetime as dt

        chunks = chunk_stats(spark, args.path)
        cands = l0_compaction_candidates(
            chunks, trigger_files=args.trigger_files
        ).collect()
        if args.max_partitions is not None:
            cands = cands[: args.max_partitions]
        for row in cands:
            when = dt.datetime.fromtimestamp(
                row.hour_bucket / 1e9, tz=dt.timezone.utc
            )
            date, hour = when.date().isoformat(), when.hour
            merged = compact_partition(spark, args.path, date, hour)
            print(f"compacted date={date} hour={hour}: {merged} files -> 1")
        print(f"done: {len(cands)} partitions compacted")

    elif args.cmd == "retention":
        cutoff_ns = int((time.time() - args.days * 86_400) * 1e9)
        chunks = chunk_stats(spark, args.path)
        old = retention_candidates(chunks, cutoff_ns).collect()
        for row in old:
            print(f"expired: {row.chunk_path}")
        if args.apply:
            import shutil

            dirs = {row.chunk_path.rsplit("/", 1)[0] for row in old}
            for dpath in sorted(dirs):
                shutil.rmtree(dpath.removeprefix("file:"), ignore_errors=True)
            print(f"dropped {len(dirs)} partitions")

    elif args.cmd == "downsample":
        from cardinalsin_spark.schema import label_columns, value_expr

        df = _read_table(args.path)
        cutoff = F.current_timestamp() - F.expr(
            f"INTERVAL {args.older_than_days} DAYS"
        )
        # The stored schema has typed value columns (value_f64/i64/u64),
        # not a single "value"; coalesce them and group by every series
        # dimension (metric_name + all label columns).
        series = ["metric_name", *label_columns(df.schema)]
        old = df.filter(F.col("timestamp") < cutoff).withColumn(
            "value", value_expr()
        )
        out = downsample(
            old,
            args.resolution_s,
            series_cols=series,
            counters=not args.no_counters,
        )
        out.write.mode("overwrite").option("compression", "zstd").parquet(args.out)
        print(f"downsampled to {args.resolution_s}s buckets -> {args.out}")

    elif args.cmd == "bloom":
        from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex

        idx = ChunkBloomIndex(
            args.path,
            column=args.column,
            m_bits=args.m_bits,
            k_hashes=args.k_hashes,
        )
        body = idx.build(spark)
        print(
            f"bloom sidecar over {args.column}: {len(body['files'])} files"
            f" -> {idx.path}"
        )

    elif args.cmd == "zorder":
        from cardinalsin_spark.operators.compaction import write_zordered

        a, b = [c.strip() for c in args.cols.split(",")]
        df = _read_table(args.path)
        write_zordered(
            df, args.out, a, b, bits=args.bits,
            target_files=args.target_files,
        )
        print(f"z-ordered on ({a}, {b}) -> {args.out}")

    elif args.cmd == "snapshot-compact":
        from cardinalsin_spark.sources.snapshots import SnapshotCatalog

        cat = SnapshotCatalog(args.path)
        if cat.current_version() is None:
            cat.init_from_directory()
            print(f"bootstrapped manifest v0 from {args.path}")
        v = cat.compact(
            spark,
            target_files=args.target_files,
            ts_col=args.ts_col,
            retries=args.retries,
        )
        print(
            f"snapshot-compacted {args.path} -> v{v}"
            f" ({len(cat.files(v))} files)"
        )

    elif args.cmd == "vacuum":
        from cardinalsin_spark.sources.snapshots import SnapshotCatalog

        deleted = SnapshotCatalog(args.path).vacuum(keep_last=args.keep_last)
        print(f"vacuumed {args.path}: {len(deleted)} files reclaimed")

    elif args.cmd == "rollup-refresh":
        from cardinalsin_spark.operators.rollup import refresh_rollup
        from cardinalsin_spark.schema import label_columns, value_expr
        from cardinalsin_spark.sources.snapshots import SnapshotCatalog

        if not _snapshot_managed(args.path):
            print(
                f"rollup-refresh: {args.path} is not snapshot-managed — "
                "run 'snapshot-compact' once (it bootstraps the manifest) "
                "or ingest through the snapshot sink first",
                file=sys.stderr,
            )
            return 2
        cat = SnapshotCatalog(args.path)
        if args.from_rollup:
            from cardinalsin_spark.operators.rollup import cascade_rollup

            base_df = cat.read(spark)
            from cardinalsin_spark.operators.compaction import MOMENT_COLS

            series = [c for c in base_df.columns if c not in MOMENT_COLS]
            v = cascade_rollup(
                spark,
                args.path,
                args.out,
                args.resolution_s,
                series,
                target_files=args.target_files,
                retries=args.retries,
            )
        else:
            base_df = cat.read(spark)
            series = ["metric_name", *label_columns(base_df.schema)]
            v = refresh_rollup(
                spark,
                cat,
                args.out,
                args.resolution_s,
                series,
                ts_col="timestamp",
                value_col="value",
                transform=lambda df: df.withColumn("value", value_expr()),
                transform_complete=True,  # canonical value reshape:
                transform_canonical=True,  # row-preserving AND union-safe
                target_files=args.target_files,
                retries=args.retries,
            )
        print(
            f"rollup-refresh {args.path} -> {args.out} v{v} "
            f"(res {args.resolution_s}s, base v{cat.current_version()})"
        )

    elif args.cmd == "sketch-refresh":
        from cardinalsin_spark.operators.quantile_sketch import (
            refresh_quantile_sketch,
        )
        from cardinalsin_spark.schema import label_columns, value_expr
        from cardinalsin_spark.sources.snapshots import SnapshotCatalog

        if not _snapshot_managed(args.path):
            print(
                f"sketch-refresh: {args.path} is not snapshot-managed — "
                "run 'snapshot-compact' once (it bootstraps the manifest) "
                "or ingest through the snapshot sink first",
                file=sys.stderr,
            )
            return 2
        cat = SnapshotCatalog(args.path)
        if args.from_sketch:
            from cardinalsin_spark.operators.quantile_sketch import (
                cascade_quantile_sketch,
            )

            # preserve the fine sketch's column order (ADVICE r13 #3):
            # an alphabetized set-difference made the coarse tier's
            # column order drift from the fine tier's metric_name-first
            # layout — harmless to unionByName consumers, but the tiers
            # should stay column-order-identical
            series = [
                c
                for c in cat.read(spark).columns
                if c not in ("bucket", "qslot", "qcount")
            ]
            v = cascade_quantile_sketch(
                spark,
                args.path,
                args.out,
                args.resolution_s,
                series,
                alpha=args.alpha,
                target_files=args.target_files,
                retries=args.retries,
            )
        else:
            series = ["metric_name", *label_columns(cat.read(spark).schema)]
            v = refresh_quantile_sketch(
                spark,
                cat,
                args.out,
                args.resolution_s,
                series,
                alpha=args.alpha,
                transform=lambda df: df.withColumn("value", value_expr()),
                transform_complete=True,  # canonical value reshape:
                transform_canonical=True,  # row-preserving AND union-safe
                target_files=args.target_files,
                retries=args.retries,
            )
        print(
            f"sketch-refresh {args.path} -> {args.out} v{v} "
            f"(res {args.resolution_s}s, alpha {args.alpha}, "
            f"base v{cat.current_version()})"
        )

    return 0


if __name__ == "__main__":
    sys.exit(main())
