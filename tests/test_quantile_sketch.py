"""Approximate-quantile continuous aggregates (log-bucketed sketch):
error bounds vs exact sample quantiles, sign/zero handling, exact
cascade folds, and transparent engine serving (routed bit-equal to the
raw-built sketch — the same contract as every other rollup door).
Follows the exp-histogram libm rule: no DuckDB oracle (F.log/F.pow),
pytest bounds + parity only (SCALE.md "Determinism at scale")."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators.quantile_sketch import (
    coarsen_quantile_sketch,
    downsample_quantile_sketch,
    sketch_quantile,
)

START = 1704067200  # 2024-01-01 00:00:00 UTC


def _metrics_df(spark, values_by_series, t0=START):
    rows = []
    for name, vals in values_by_series.items():
        for i, v in enumerate(vals):
            rows.append((t0 + i, name, v))
    return spark.createDataFrame(
        rows, "ts long, metric_name string, value double"
    ).select(
        F.timestamp_seconds("ts").alias("timestamp"), "metric_name", "value"
    )


def _exact_nearest_rank(vals, q):
    """The convention sketch_quantile targets: the (floor(q*(n-1))+1)-th
    smallest sample."""
    s = sorted(vals)
    return s[int(math.floor(q * (len(s) - 1)))]


def test_error_bound_and_signs(spark):
    rng = random.Random(5)
    pos = [math.exp(rng.uniform(-3, 8)) for _ in range(4000)]
    mixed = (
        [-math.exp(rng.uniform(-2, 5)) for _ in range(1500)]
        + [0.0] * 300
        + [math.exp(rng.uniform(-2, 5)) for _ in range(2200)]
    )
    rng.shuffle(mixed)
    alpha = 0.01
    df = _metrics_df(spark, {"pos": pos, "mixed": mixed})
    # 86400 tiles from START (midnight UTC) — one bucket per series
    sk = downsample_quantile_sketch(df, 86400, ["metric_name"], alpha)
    for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
        got = {
            r.metric_name: r.value
            for r in sketch_quantile(sk, q, ["metric_name"], alpha).collect()
        }
        for name, vals in (("pos", pos), ("mixed", mixed)):
            exact = _exact_nearest_rank(vals, q)
            if exact == 0.0:
                assert got[name] == 0.0, (name, q)
            else:
                rel = abs(got[name] - exact) / abs(exact)
                assert rel <= alpha + 1e-12, (name, q, got[name], exact)
    # the q=0/q=1 estimates sit in the min/max sample's slot: same sign
    assert sketch_quantile(sk, 0.0, ["metric_name"], alpha).filter(
        F.col("metric_name") == "mixed"
    ).first().value < 0
    assert sketch_quantile(sk, 1.0, ["metric_name"], alpha).filter(
        F.col("metric_name") == "mixed"
    ).first().value > 0


def test_cascade_fold_is_exact(spark):
    """Slot counts add: a coarse sketch folded from the fine tier is
    IDENTICAL to sketching raw at the coarse step — cascades never grow
    the error (unlike centroid sketches)."""
    rng = random.Random(7)
    vals = [math.exp(rng.uniform(-4, 6)) * (1 if rng.random() < 0.8 else -1)
            for _ in range(7200)]
    df = _metrics_df(spark, {"m": vals})
    fine = downsample_quantile_sketch(df, 300, ["metric_name"], 0.02)
    coarse_folded = coarsen_quantile_sketch(fine, 3600, ["metric_name"])
    coarse_direct = downsample_quantile_sketch(df, 3600, ["metric_name"], 0.02)
    assert sorted(map(tuple, coarse_folded.collect())) == sorted(
        map(tuple, coarse_direct.collect())
    )
    # and the quantiles served from either are bit-equal
    a = sketch_quantile(coarse_folded, 0.95, ["metric_name"], 0.02).collect()
    b = sketch_quantile(coarse_direct, 0.95, ["metric_name"], 0.02).collect()
    assert a == b


def test_engine_quantile_approx_routes_sketch(spark, tmp_path):
    """engine.quantile_approx serves from an attached sketch when the
    geometry and alpha match — bit-equal to the raw-built sketch path
    (both build the same per-(step, slot) counts); misaligned bounds or
    a different alpha fall back to raw."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    rng = random.Random(11)
    src = spark.createDataFrame(
        [
            (
                (START + i // 2) * 10**9,
                "lat" if i % 2 == 0 else "mem",
                math.exp(rng.uniform(-2, 6)),
            )
            for i in range(7200)
        ],
        "ts_ns long, name string, v double",
    )
    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(src, "ts_ns", "name", "v"), path,
        mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    raw = CardinalSin(spark, path)
    sp = str(tmp_path / "qs300")
    downsample_quantile_sketch(
        eng.metrics.withColumn("value", value_expr()), 300,
        ["metric_name"], 0.01,
    ).write.parquet(sp)
    eng.attach_quantile_sketch(sp, 300, alpha=0.01)
    start, end, step = START, START + 3600 - 1, 600
    for sel, q in (("lat", 0.99), ("mem", 0.5), ('{__name__=~"l.*"}', 0.9)):
        got = eng.quantile_approx(sel, q, start, end, step, alpha=0.01)
        # inputFiles, not the plan string: toString truncates long file
        # locations, so the path check was flaky by tmp-dir name length
        files = got.inputFiles()
        assert files and all("qs300" in f for f in files), (sel, files)
        exp = raw.quantile_approx(sel, q, start, end, step, alpha=0.01)
        assert got.collect() == exp.collect(), (sel, q)
        assert got.columns == ["time_bucket", "metric_name", "value"]
    # sanity: the served estimate tracks the exact per-bucket quantile
    exact = (
        raw.metrics.withColumn("value", value_expr())
        .filter(F.col("metric_name") == "lat")
        .filter(
            (F.col("timestamp") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("timestamp") <= F.timestamp_seconds(F.lit(end)))
        )
        .groupBy(F.window("timestamp", "600 seconds").start.alias("tb"))
        .agg(F.expr("sort_array(collect_list(value))").alias("vs"))
        .select(
            "tb",
            F.expr(
                "vs[cast(floor(0.99 * (size(vs) - 1)) as int)]"
            ).alias("exact"),
        )
        .collect()
    )
    got = {
        r.time_bucket: r.value
        for r in eng.quantile_approx("lat", 0.99, start, end, step).collect()
    }
    for r in exact:
        rel = abs(got[r.tb] - r.exact) / abs(r.exact)
        assert rel <= 0.01 + 1e-12, (r.tb, got[r.tb], r.exact)
    # fall-backs: misaligned bounds; a different alpha (a different
    # error bound is a different question — never silently substitute)
    for kwargs in (
        {"start_s": start + 7, "end_s": end, "step_s": step, "alpha": 0.01},
        {"start_s": start, "end_s": end, "step_s": step, "alpha": 0.05},
    ):
        got = eng.quantile_approx("lat", 0.9, **kwargs)
        assert not any("qs300" in f for f in got.inputFiles()), kwargs
        assert (
            got.collect()
            == raw.quantile_approx("lat", 0.9, **kwargs).collect()
        )
    # guard rails
    with pytest.raises(ValueError):
        eng.quantile_approx("rate(lat[60s])", 0.9, start, end, step)
    with pytest.raises(ValueError):
        eng.attach_quantile_sketch(sp, 300, alpha=0.01, fresh="bogus")
    with pytest.raises(ValueError):
        eng.attach_quantile_sketch(sp, 0)
    with pytest.raises(ValueError):
        eng.attach_quantile_sketch(sp, 300, alpha=1.5)


def test_refresh_quantile_sketch_lifecycle(spark, tmp_path):
    """refresh_quantile_sketch: bootstrap == direct sketch; append-only
    increments fold exactly (counts add); a rewrite-shaped base commit
    rebuilds; the engine's freshness guard drops a stale sketch from
    routing (raw answers, same estimates) and resumes after refresh;
    alpha mismatches loud-reject at attach and refresh."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    rng = random.Random(13)

    def batch(i0, i1):
        return spark.createDataFrame(
            [
                ((START + i) * 10**9, "m", math.exp(rng.uniform(-2, 5)))
                for i in range(i0, i1)
            ],
            "ts_ns long, name string, v double",
        )

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(batch(0, 2400), "ts_ns", "name", "v"), path,
        mode="overwrite",
    )
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    sk_root = str(tmp_path / "qs300")
    shape = lambda df: df.withColumn("value", value_expr())  # noqa: E731

    def check_equals_direct():
        got = sorted(map(tuple, SnapshotCatalog(sk_root).read(spark).collect()))
        want = sorted(
            map(
                tuple,
                downsample_quantile_sketch(
                    shape(cat.read(spark)), 300, ["metric_name"], 0.01
                ).collect(),
            )
        )
        assert got == want

    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01, transform=shape,
        transform_complete=True
    )
    check_equals_direct()
    # append → incremental fold, bit-equal to a direct re-sketch
    write_metrics(
        normalize_to_metrics(batch(2400, 3600), "ts_ns", "name", "v"), path
    )
    cat.commit_new_files()
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01, transform=shape,
        transform_complete=True
    )
    check_equals_direct()
    # engine serving honors freshness: stale after another append →
    # raw path (same rows); refresh → sketch routes again
    write_metrics(
        normalize_to_metrics(batch(3600, 4200), "ts_ns", "name", "v"), path
    )
    cat.commit_new_files()
    eng = CardinalSin(spark, path)
    raw = CardinalSin(spark, path)
    eng.attach_quantile_sketch(sk_root, 300, alpha=0.01)
    start, end, step = START, START + 3600 - 1, 600
    got = eng.quantile_approx("m", 0.9, start, end, step)
    assert "qs300" not in got._jdf.queryExecution().executedPlan().toString()
    assert got.collect() == raw.quantile_approx(
        "m", 0.9, start, end, step
    ).collect()
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01, transform=shape,
        transform_complete=True
    )
    check_equals_direct()
    got = eng.quantile_approx("m", 0.9, start, end, step)
    # truncation-proof route pin: plan strings elide long paths, so
    # check the actual input files (all sketch, no metrics)
    files = got.inputFiles()
    assert files and all("qs300" in f for f in files), files
    assert got.collect() == raw.quantile_approx(
        "m", 0.9, start, end, step
    ).collect()
    # rewrite-shaped base commit (compaction) → rebuild, still equal
    cat.compact(spark, target_files=1)
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01, transform=shape,
        transform_complete=True
    )
    check_equals_direct()
    # alpha discipline: refresh and attach both loud-reject a mismatch
    with pytest.raises(ValueError):
        refresh_quantile_sketch(
            spark, cat, sk_root, 300, ["metric_name"], 0.05, transform=shape,
        transform_complete=True
        )
    with pytest.raises(ValueError):
        CardinalSin(spark, path).attach_quantile_sketch(
            sk_root, 300, alpha=0.05
        )
    # a manifest-less sketch over a live base loud-rejects (fallback
    # has nothing to check freshness against) but attaches as static
    plain = str(tmp_path / "plain_sketch")
    downsample_quantile_sketch(
        shape(cat.read(spark)), 300, ["metric_name"], 0.01
    ).write.parquet(plain)
    with pytest.raises(ValueError):
        CardinalSin(spark, path).attach_quantile_sketch(plain, 300)
    CardinalSin(spark, path).attach_quantile_sketch(
        plain, 300, fresh="static"
    )


def test_jobs_sketch_refresh_cli(spark, tmp_path, capsys):
    """CLI smoke for `jobs sketch-refresh`: bootstrap prints the
    version and stamps the manifest (resolution + alpha); non-snapshot
    bases rc=2 loud-reject; the committed sketch equals a direct
    sketch."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "m")
    src = spark.range(0, 1000).select(
        (F.lit(START * 1_000_000_000)
         + F.col("id").cast("long") * F.lit(10**9)).alias("ts_ns"),
        F.lit("x").alias("name"),
        (F.col("id") % 37 + 1).cast("double").alias("v"),
    )
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    out = str(tmp_path / "qs")
    assert jobs.main(
        ["sketch-refresh", "--path", path, "--out", out,
         "--resolution-s", "300", "--alpha", "0.02"]
    ) == 2
    SnapshotCatalog(path).init_from_directory()
    assert jobs.main(
        ["sketch-refresh", "--path", path, "--out", out,
         "--resolution-s", "300", "--alpha", "0.02"]
    ) == 0
    assert "v0" in capsys.readouterr().out
    man = SnapshotCatalog(out).manifest(0)
    assert man["rollup_resolution_s"] == 300
    assert man["sketch_alpha"] == 0.02
    got = sorted(map(tuple, SnapshotCatalog(out).read(spark).collect()))
    want = sorted(
        map(
            tuple,
            downsample_quantile_sketch(
                SnapshotCatalog(path)
                .read(spark)
                .withColumn("value", value_expr()),
                300,
                ["metric_name"],
                0.02,
            ).collect(),
        )
    )
    assert got == want


def test_nonfinite_values_and_modifier_guards(spark, tmp_path):
    """Review r12 fixes: NaN samples are excluded (Spark's NaN>0 would
    otherwise count them as ~1.0 values), ±Inf keeps dedicated extreme
    slots (the long add would otherwise overflow and invert the value
    order), offset/@ loud-reject in quantile_approx, and a declared
    resolution that contradicts the sketch manifest loud-rejects at
    attach."""
    nan, inf = float("nan"), float("inf")
    vals = [1.0, 2.0, 3.0, 4.0, nan, nan, inf, -inf]
    df = _metrics_df(spark, {"m": vals})
    sk = downsample_quantile_sketch(df, 86400, ["metric_name"], 0.01)
    # 6 non-NaN samples: ranks 1..6 = [-inf, 1, 2, 3, 4, +inf]
    q0 = sketch_quantile(sk, 0.0, ["metric_name"], 0.01).first().value
    q1 = sketch_quantile(sk, 1.0, ["metric_name"], 0.01).first().value
    qm = sketch_quantile(sk, 0.5, ["metric_name"], 0.01).first().value
    assert q0 == float("-inf") and q1 == float("inf")
    # target = floor(0.5*(6-1))+1 = 3rd smallest of [-inf,1,2,3,4,inf]
    assert abs(qm - 2.0) / 2.0 <= 0.01
    # NaN rows land in the NULL_SLOT sentinel (key presence for the
    # DISTINCT doors) and NEVER in a value slot — the rank walks above
    # already proved they are outside the distribution
    from cardinalsin_spark.operators.quantile_sketch import NULL_SLOT

    total = sk.filter(F.col("qslot") != NULL_SLOT).agg(
        F.sum("qcount")
    ).first()[0]
    assert total == 6
    assert sk.filter(F.col("qslot") == NULL_SLOT).first().qcount == 2
    # modifier guards
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    path = str(tmp_path / "m")
    src = spark.range(0, 100).select(
        (F.lit(START * 10**9)).alias("ts_ns"),
        F.lit("x").alias("name"),
        F.col("id").cast("double").alias("v"),
    )
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    eng = CardinalSin(spark, path)
    with pytest.raises(ValueError):
        eng.quantile_approx("x offset 300s", 0.9, START, START + 599, 300)
    with pytest.raises(ValueError):
        eng.quantile_approx("x @ 100", 0.9, START, START + 599, 300)
    # manifest-resolution contradiction loud-rejects at attach
    from cardinalsin_spark.operators.quantile_sketch import (
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    SnapshotCatalog(path).init_from_directory()
    sk_root = str(tmp_path / "qs")
    refresh_quantile_sketch(
        spark, SnapshotCatalog(path), sk_root, 300, ["metric_name"], 0.01,
        transform=lambda d: d.withColumn("value", value_expr()),
        transform_complete=True,
    )
    with pytest.raises(ValueError):
        CardinalSin(spark, path).attach_quantile_sketch(
            sk_root, 600, alpha=0.01
        )


def _norm_shape():
    from cardinalsin_spark.schema import value_expr

    return lambda df: df.withColumn("value", value_expr())


def _sk_batch(spark, i0, i1, seed=13):
    rng = random.Random(seed)
    vals = [math.exp(rng.uniform(-2, 5)) for _ in range(i1)]
    return spark.createDataFrame(
        [((START + i) * 10**9, "m", vals[i]) for i in range(i0, i1)],
        "ts_ns long, name string, v double",
    )


def test_sketch_union_serving(spark, tmp_path):
    """VERDICT r12 item 1: a stale-but-append-only sketch under
    fresh='union' serves sketch rows ∪ the CDC delta's slot counts —
    bit-equal to the raw path (counts add), with inputFiles pinned to
    the sketch plus ONLY the delta base files (the lagging history is
    never rescanned); fresh='fallback' on the same state falls back."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 2400), "ts_ns", "name", "v"),
        path, mode="overwrite",
    )
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    sk_root = str(tmp_path / "qs300")
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01,
        transform=_norm_shape(), transform_complete=True,
        transform_canonical=True,  # union-safe: the engine's reshape
    )
    rb = SnapshotCatalog(sk_root).manifest()["rollup_base_version"]
    # base moves on WITHOUT a sketch refresh
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 2400, 3600), "ts_ns", "name",
                             "v"), path,
    )
    cat.commit_new_files()
    head = cat.current_version()
    added = {f for f in cat.diff(rb, head)["added"]}
    assert added, "append must produce a CDC delta"

    eng = CardinalSin(spark, path)
    raw = CardinalSin(spark, path)
    eng.attach_quantile_sketch(sk_root, 300, alpha=0.01, fresh="union")
    st = eng.sketch_status()[0]
    assert st["eligible"] and "union" in st["reason"], st

    start, end, step = START, START + 3600 - 1, 600
    got = eng.quantile_approx("m", 0.9, start, end, step)
    want = raw.quantile_approx("m", 0.9, start, end, step)
    assert got.collect() == want.collect()
    # route pin: sketch files + ONLY the delta base files
    files = got.inputFiles()
    assert any("qs300" in f for f in files), files
    base_files = [f for f in files if "qs300" not in f]
    assert base_files, "the delta arm must read the appended files"
    for f in base_files:
        assert any(f.endswith(a) or a in f for a in added), (f, added)

    # the same staleness under 'fallback' refuses the sketch entirely
    fb = CardinalSin(spark, path)
    fb.attach_quantile_sketch(sk_root, 300, alpha=0.01)
    st = fb.sketch_status()[0]
    assert not st["eligible"], st
    got_fb = fb.quantile_approx("m", 0.9, start, end, step)
    assert not any("qs300" in f for f in got_fb.inputFiles())
    assert got_fb.collect() == want.collect()

    # a rewrite-shaped base diff (compaction) is not unionable → raw
    cat.compact(spark, target_files=1)
    st = eng.sketch_status()[0]
    assert not st["eligible"] and "append-only" in st["reason"], st
    got2 = eng.quantile_approx("m", 0.9, start, end, step)
    assert not any("qs300" in f for f in got2.inputFiles())
    assert got2.collect() == raw.quantile_approx(
        "m", 0.9, start, end, step
    ).collect()


def test_sketch_cascade_pyramid(spark, tmp_path):
    """Cascaded sketch tiers (VERDICT r12 item 1, second half): a 300s →
    3600s pyramid maintained by cascade_quantile_sketch is bit-equal to
    sketching raw at 3600s; a STALE coarse tier whose parent chain is
    fresh serves tier rows ∪ the parent-delta recompute under
    fresh='union' — reading only sketch catalogs, never raw metrics."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        cascade_quantile_sketch,
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 3600, seed=29), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    fine_root = str(tmp_path / "qs300")
    coarse_root = str(tmp_path / "qs3600")
    shape = _norm_shape()
    refresh_quantile_sketch(
        spark, cat, fine_root, 300, ["metric_name"], 0.01,
        transform=shape, transform_complete=True,
        transform_canonical=True,
    )
    cascade_quantile_sketch(spark, fine_root, coarse_root, 3600,
                            ["metric_name"], 0.01)
    # the cascaded tier == sketching raw straight at 3600s
    got = sorted(map(tuple,
                     SnapshotCatalog(coarse_root).read(spark).collect()))
    want = sorted(map(tuple, downsample_quantile_sketch(
        shape(cat.read(spark)), 3600, ["metric_name"], 0.01
    ).collect()))
    assert got == want

    # guard rails: resolution not a multiple / alpha mismatch loud-reject
    with pytest.raises(ValueError, match="multiple"):
        cascade_quantile_sketch(spark, fine_root,
                                str(tmp_path / "bad"), 450,
                                ["metric_name"], 0.01)
    with pytest.raises(ValueError, match="alpha"):
        cascade_quantile_sketch(spark, fine_root,
                                str(tmp_path / "bad2"), 3600,
                                ["metric_name"], 0.05)

    # base moves on; ONLY the fine tier refreshes → coarse is stale with
    # a fresh parent chain: the invalidation-region recompute serves
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 3600, 5400, seed=29), "ts_ns",
                             "name", "v"), path,
    )
    cat.commit_new_files()
    refresh_quantile_sketch(
        spark, cat, fine_root, 300, ["metric_name"], 0.01,
        transform=shape, transform_complete=True,
        transform_canonical=True,
    )
    eng = CardinalSin(spark, path)
    raw = CardinalSin(spark, path)
    eng.attach_quantile_sketch(coarse_root, 3600, alpha=0.01, fresh="union")
    st = eng.sketch_status()[0]
    assert st["eligible"] and "touched coarse buckets" in st["reason"], st
    start, end, step = START, START + 7200 - 1, 3600
    got = eng.quantile_approx("m", 0.95, start, end, step)
    files = got.inputFiles()
    assert files and all(
        ("qs300" in f) or ("qs3600" in f) for f in files
    ), files  # sketch catalogs only — raw metrics never rescanned
    assert got.collect() == raw.quantile_approx(
        "m", 0.95, start, end, step
    ).collect()

    # catching the coarse tier up empties the invalidation region:
    # plain fresh serving, same answer
    cascade_quantile_sketch(spark, fine_root, coarse_root, 3600,
                            ["metric_name"], 0.01)
    st = eng.sketch_status()[0]
    assert st["eligible"] and "union" not in st["reason"], st
    got = eng.quantile_approx("m", 0.95, start, end, step)
    assert all("qs3600" in f for f in got.inputFiles())
    assert got.collect() == raw.quantile_approx(
        "m", 0.95, start, end, step
    ).collect()

    # a stale PARENT chain takes the whole pyramid out (never a
    # stale-on-stale recompute): append without refreshing the fine tier
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 5400, 6000, seed=29), "ts_ns",
                             "name", "v"), path,
    )
    cat.commit_new_files()
    st = eng.sketch_status()[0]
    assert not st["eligible"] and "cascade recompute unavailable" in (
        st["reason"]
    ), st
    got = eng.quantile_approx("m", 0.95, start, end, step)
    assert not any("qs3600" in f for f in got.inputFiles())
    assert got.collect() == raw.quantile_approx(
        "m", 0.95, start, end, step
    ).collect()


def _prove_sketch(path, resolution_s, alpha=0.01):
    """Manifest-bootstrap a plain-parquet sketch with the keys the SQL
    quantile door requires (sketch_null_slot proof + alpha/resolution)."""
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    cat = SnapshotCatalog(path)
    cat.commit(
        cat._list_parquet(path),
        None,
        extra={
            "rollup_resolution_s": int(resolution_s),
            "sketch_alpha": float(alpha),
            "sketch_null_slot": True,
        },
    )


def test_sql_door_sketch_routing(spark, tmp_path):
    """VERDICT r12 item 5: approx_percentile/percentile_approx over a
    time_bucket grid routes through an attached quantile sketch under the
    full-consumption never-guess grammar — sketch scanned, raw absent;
    the routed estimates equal sketch_quantile over the raw-built sketch
    (same counts, same rank walk) and sit within α of the exact sample
    quantile. Refusals: mixed moment+quantile selects, HAVING, misaligned
    bounds — all pass through to Spark's own estimator."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.rollup import match_bucket_quantile_sql
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 3600, seed=41), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    shaped = eng.metrics.withColumn("value", value_expr())
    shaped.createOrReplaceTempView("metrics")
    sp = str(tmp_path / "qs300")
    downsample_quantile_sketch(shaped, 300, ["metric_name"], 0.01).write.parquet(sp)
    _prove_sketch(sp, 300)  # the SQL door requires the NULL_SLOT proof
    eng.attach_quantile_sketch(sp, 300, alpha=0.01)
    start, end = START, START + 3600 - 1
    q = (
        "SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
        "approx_percentile(value, 0.5) AS p50, "
        "percentile_approx(value, 0.99) AS p99 FROM metrics "
        f"WHERE timestamp >= timestamp_seconds({start}) "
        f"AND timestamp <= timestamp_seconds({end}) "
        "GROUP BY tb, metric_name ORDER BY tb, metric_name"
    )
    routed = eng._maybe_route_sql_sketch(q)
    assert routed is not None, "grammar + alignment must route"
    out = eng.sql(q)
    files = out.inputFiles()
    assert files and all("qs300" in f for f in files), files
    assert out.columns == ["tb", "metric_name", "p50", "p99"]
    # parity with the explicit sketch path: same counts, same rank walk
    win = shaped.filter(
        (F.col("timestamp") >= F.timestamp_seconds(F.lit(start)))
        & (F.col("timestamp") <= F.timestamp_seconds(F.lit(end)))
    )
    sk = downsample_quantile_sketch(win, 600, ["metric_name"], 0.01)
    for col, qq in (("p50", 0.5), ("p99", 0.99)):
        want = {
            (r.bucket, r.metric_name): r.value
            for r in sketch_quantile(sk, qq, ["metric_name"], 0.01).collect()
        }
        got = {(r.tb, r.metric_name): r[col] for r in out.collect()}
        assert got == want, col
    # α-bound sanity vs the exact sample quantile
    exact = (
        win.groupBy(
            F.window("timestamp", "600 seconds").start.alias("tb"),
            "metric_name",
        )
        .agg(F.expr("sort_array(collect_list(value))").alias("vs"))
        .select(
            "tb", "metric_name",
            F.expr("vs[cast(floor(0.99 * (size(vs) - 1)) as int)]").alias("e"),
        )
        .collect()
    )
    got = {(r.tb, r.metric_name): r.p99 for r in out.collect()}
    for r in exact:
        rel = abs(got[(r.tb, r.metric_name)] - r.e) / abs(r.e)
        assert rel <= 0.01 + 1e-9, (r.tb, rel)
    # refusals → None from the door; eng.sql still answers via Spark
    refuse = [
        # mixed moment+quantile select: two doors, never guess
        ("SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
         "sum(value) AS s, approx_percentile(value, 0.9) AS p90 "
         "FROM metrics "
         f"WHERE timestamp >= timestamp_seconds({start}) "
         f"AND timestamp <= timestamp_seconds({end}) "
         "GROUP BY tb, metric_name"),
        # HAVING on an estimator: row membership decided by
        # approximation error — refuse
        ("SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
         "approx_percentile(value, 0.9) AS p90 FROM metrics "
         f"WHERE timestamp >= timestamp_seconds({start}) "
         f"AND timestamp <= timestamp_seconds({end}) "
         "GROUP BY tb, metric_name HAVING approx_percentile(value, 0.9) > 1"),
        # misaligned bounds: a straddling bucket would leak samples
        ("SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
         "approx_percentile(value, 0.9) AS p90 FROM metrics "
         f"WHERE timestamp >= timestamp_seconds({start + 7}) "
         f"AND timestamp <= timestamp_seconds({end}) "
         "GROUP BY tb, metric_name"),
        # r13 review finding 5: an output alias colliding with a
        # sketch-internal column would make the routed plan raise
        # AMBIGUOUS_REFERENCE — refuse instead (raw answers)
        ("SELECT time_bucket(timestamp, 600) AS qslot, metric_name, "
         "approx_percentile(value, 0.9) AS p90 FROM metrics "
         f"WHERE timestamp >= timestamp_seconds({start}) "
         f"AND timestamp <= timestamp_seconds({end}) "
         "GROUP BY qslot, metric_name"),
        # 3-arg accuracy form pins Spark's KLL estimator — never route
        ("SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
         "percentile_approx(value, 0.9, 100) AS p90 FROM metrics "
         f"WHERE timestamp >= timestamp_seconds({start}) "
         f"AND timestamp <= timestamp_seconds({end}) "
         "GROUP BY tb, metric_name"),
    ]
    for bad in refuse:
        assert eng._maybe_route_sql_sketch(bad) is None, bad
        res = eng.sql(bad)  # passes through to Spark untouched
        assert not any("qs300" in f for f in res.inputFiles()), bad
        assert res.count() > 0
    # r13 review finding 3: bucketing a NON-timestamp column must never
    # route onto sketch buckets built over `timestamp` (door-only check
    # — the raw form of this contrived query is itself a type error)
    assert eng._maybe_route_sql_sketch(
        "SELECT time_bucket(ts_ns, 600) AS tb, metric_name, "
        "approx_percentile(value, 0.9) AS p90 FROM metrics "
        f"WHERE ts_ns >= timestamp_seconds({start}) "
        f"AND ts_ns <= timestamp_seconds({end}) "
        "GROUP BY tb, metric_name"
    ) is None


def test_advisor_recommends_sketch_and_histogram_tiers(spark, tmp_path):
    """VERDICT r12 item 7: the workload log tags quantile- and
    histogram-shaped queries, and recommend_rollups() emits kind-tagged
    recommendations — sketch tiers carry (resolution, α) and check
    attachment against the attached SKETCHES, histogram shapes recommend
    an le-keyed rollup resolution, moment shapes behave as before."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 1200, seed=3), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    assert eng.recommend_rollups() == []
    start, end = START, START + 3600 - 1
    # 3 quantile shapes at α=0.01 (two API, one SQL-door with default α)
    eng.quantile_approx("m", 0.9, start, end, 600)
    eng.quantile_approx("m", 0.5, start, end, 600)
    eng.metrics.withColumn("value", value_expr()).createOrReplaceTempView(
        "metrics"
    )
    eng.sql(
        "SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
        "approx_percentile(value, 0.9) AS p90 FROM metrics "
        f"WHERE timestamp >= timestamp_seconds({start}) "
        f"AND timestamp <= timestamp_seconds({end}) "
        "GROUP BY tb, metric_name"
    )
    # 2 histogram shapes + 1 moment shape through the promql door; the
    # fixture has no `le` families, so the histogram queries may error
    # AFTER logging — the advisor must still see the demand (a Grafana
    # panel that errors for lack of buckets is exactly the workload a
    # histogram tier recommendation should answer)
    import contextlib

    with contextlib.suppress(Exception):
        eng.promql_range("histogram_quantile(0.9, m_bucket)", start, end, 600)
    with contextlib.suppress(Exception):
        eng.promql_range(
            "histogram_fraction(0, 100, m_bucket)", start, end, 600
        )
    eng.promql_range("sum(m)", start, end, 600)
    recs = eng.recommend_rollups()
    by_kind: dict = {}
    for r in recs:
        by_kind.setdefault(r["kind"], []).append(r)
    assert set(by_kind) == {"moment", "quantile_sketch", "histogram"}
    sk = by_kind["quantile_sketch"][0]
    assert sk["alpha"] == 0.01 and sk["serves"] == 3 and sk["of"] == 3
    assert sk["resolution_s"] == 600  # the observed step (gcd == 600 too)
    assert not sk["already_attached"]
    hist = by_kind["histogram"][0]
    assert hist["serves"] == 2 and hist["of"] == 2
    mom = by_kind["moment"][0]
    assert mom["serves"] == 1 and mom["of"] == 1
    # acting on the sketch advice flips already_attached
    from cardinalsin_spark.schema import value_expr as _ve

    sp = str(tmp_path / "qs")
    downsample_quantile_sketch(
        eng.metrics.withColumn("value", _ve()), sk["resolution_s"],
        ["metric_name"], 0.01,
    ).write.parquet(sp)
    eng.attach_quantile_sketch(sp, sk["resolution_s"], alpha=0.01)
    recs = eng.recommend_rollups()
    sk2 = [r for r in recs if r["kind"] == "quantile_sketch"][0]
    assert sk2["already_attached"]


def test_engine_refresh_and_cli_cascade(spark, tmp_path, capsys):
    """engine.refresh_quantile_sketch (the refresh_rollup twin) bootstraps
    and serves; `jobs sketch-refresh --from-sketch` cascades a fine sketch
    to a coarser tier — bit-equal to sketching raw at the coarse step."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 3600, seed=59), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    SnapshotCatalog(path).init_from_directory()
    eng = CardinalSin(spark, path)
    fine_root = str(tmp_path / "qs300")
    assert eng.refresh_quantile_sketch(fine_root, 300,
                                       series_cols=["metric_name"]) == 0
    man = SnapshotCatalog(fine_root).manifest()
    assert man["sketch_alpha"] == 0.01 and man["rollup_complete"] is True
    eng.attach_quantile_sketch(fine_root, 300, alpha=0.01)
    start, end, step = START, START + 3600 - 1, 600
    got = eng.quantile_approx("m", 0.9, start, end, step)
    assert all("qs300" in f for f in got.inputFiles())
    raw = CardinalSin(spark, path)
    assert got.collect() == raw.quantile_approx(
        "m", 0.9, start, end, step
    ).collect()
    # CLI cascade: fine -> 3600s coarse tier, never rescanning raw
    coarse_root = str(tmp_path / "qs3600")
    rc = jobs.main(
        ["sketch-refresh", "--path", fine_root, "--out", coarse_root,
         "--resolution-s", "3600", "--from-sketch"]
    )
    assert rc == 0
    assert "sketch-refresh" in capsys.readouterr().out
    got = sorted(map(tuple,
                     SnapshotCatalog(coarse_root).read(spark).collect()))
    want = sorted(map(tuple, downsample_quantile_sketch(
        SnapshotCatalog(path).read(spark).withColumn("value", value_expr()),
        3600, ["metric_name"], 0.01,
    ).collect()))
    assert got == want
    cman = SnapshotCatalog(coarse_root).manifest()
    assert cman["rollup_base_root"].endswith("qs300")
    assert cman["sketch_alpha"] == 0.01


def test_metadata_doors_serve_from_sketch(spark, tmp_path):
    """Serving-matrix symmetry: when no moment rollup qualifies, the
    metadata endpoints (label_values/series) and the SQL DISTINCT door
    serve from a fresh attached quantile sketch — the NULL_SLOT sentinel
    makes it a COMPLETE downsample, so a series whose in-window samples
    are all NULL still appears (the r13 review failure scenario). Only
    sketches whose manifest proves the sentinel property
    (``sketch_null_slot``) may serve; a qualifying rollup still wins;
    misaligned bounds scan raw."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.compaction import downsample
    from cardinalsin_spark.operators.quantile_sketch import (
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    # m0/m1/m2 carry values; m3's samples are ALL NULL (value-less
    # points) — raw DISTINCT keeps it, so every served DISTINCT must too
    src = spark.createDataFrame(
        [
            (
                (START + i) * 10**9,
                "m" + str(i % 4),
                None if i % 4 == 3 else float(i % 11),
            )
            for i in range(1800)
        ],
        "ts_ns long, name string, v double",
    )
    path = str(tmp_path / "metrics")
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    eng = CardinalSin(spark, path)
    sp = str(tmp_path / "qs300")
    refresh_quantile_sketch(
        spark, cat, sp, 300, ["metric_name"], 0.01,
        transform=_norm_shape(), transform_complete=True,
        transform_canonical=True,
    )
    assert SnapshotCatalog(sp).manifest()["sketch_null_slot"] is True
    eng.attach_quantile_sketch(sp, 300, alpha=0.01)
    start, end = START, START + 1799  # (end+1) % 300 == 0
    want = ["m0", "m1", "m2", "m3"]

    got = eng.label_values("metric_name", None, start, end)
    assert got.inputFiles() and all("qs300" in f for f in got.inputFiles())
    assert [r[0] for r in got.collect()] == want
    got = eng.series(None, start, end)
    assert all("qs300" in f for f in got.inputFiles())
    assert got.count() == 4
    q = (
        "SELECT DISTINCT metric_name FROM metrics "
        f"WHERE timestamp >= timestamp_seconds({start}) "
        f"AND timestamp <= timestamp_seconds({end}) ORDER BY metric_name"
    )
    got = eng.sql(q)
    assert all("qs300" in f for f in got.inputFiles())
    assert [r[0] for r in got.collect()] == want
    # misaligned bounds: raw scan, same answer
    got = eng.label_values("metric_name", None, start + 7, end)
    assert not any("qs300" in f for f in got.inputFiles())
    assert [r[0] for r in got.collect()] == want
    # a pre-sentinel / plain-parquet sketch cannot PROVE completeness —
    # it must never serve the metadata doors
    plain_eng = CardinalSin(spark, path)
    pp = str(tmp_path / "plain_sketch")
    downsample_quantile_sketch(
        plain_eng.metrics.withColumn("value", value_expr()), 300,
        ["metric_name"], 0.01,
    ).write.parquet(pp)
    plain_eng.attach_quantile_sketch(pp, 300, alpha=0.01, fresh="static")
    got = plain_eng.label_values("metric_name", None, start, end)
    assert not any("plain_sketch" in f for f in got.inputFiles())
    assert [r[0] for r in got.collect()] == want
    # a qualifying moment rollup wins over the sketch (fewer rows)
    rp = str(tmp_path / "r300")
    downsample(
        eng.metrics.withColumn("value", value_expr()), 300, ["metric_name"]
    ).write.parquet(rp)
    eng.attach_rollup(rp, 300, fresh="static")
    got = eng.label_values("metric_name", None, start, end)
    files = got.inputFiles()
    assert files and all("r300" in f for f in files), files
    assert [r[0] for r in got.collect()] == want



def test_apply_recommendation_closes_the_loop(spark, tmp_path):
    """engine.apply_recommendation materializes + attaches the advised
    tier (moment rollup or quantile sketch) — recommend → apply → the
    next recommend reports already_attached and the query routes."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 1800, seed=67), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    SnapshotCatalog(path).init_from_directory()
    eng = CardinalSin(spark, path)
    start, end = START, START + 1799
    eng.promql_range("sum(m)", start, end, 600)
    eng.quantile_approx("m", 0.9, start, end, 600)
    recs = {r["kind"]: r for r in eng.recommend_rollups()}
    assert {"moment", "quantile_sketch"} <= set(recs)

    eng.apply_recommendation(recs["moment"], str(tmp_path / "ru"),
                             series_cols=["metric_name"])
    eng.apply_recommendation(recs["quantile_sketch"], str(tmp_path / "qs"),
                             series_cols=["metric_name"])
    after = {r["kind"]: r for r in eng.recommend_rollups()}
    assert after["moment"]["already_attached"]
    assert after["quantile_sketch"]["already_attached"]
    # and both tiers actually serve
    got = eng.promql_range("sum(m)", start, end, 600)
    assert all("/ru" in f for f in got.inputFiles()), got.inputFiles()
    got = eng.quantile_approx("m", 0.9, start, end, 600)
    assert all("/qs" in f for f in got.inputFiles()), got.inputFiles()
    with pytest.raises(ValueError, match="kind"):
        eng.apply_recommendation({"kind": "bogus", "resolution_s": 600},
                                 str(tmp_path / "x"))
    # r13 second-review finding 3: subsecond threads through to the
    # attach — otherwise micros-bounds workloads never route while
    # already_attached reads True (a silent adaptive dead end)
    eng.apply_recommendation(recs["quantile_sketch"],
                             str(tmp_path / "qs_sub"),
                             series_cols=["metric_name"], subsecond=True)
    assert eng._attached_sketches[-1][2] is True  # the subsecond flag


def test_null_slot_property_is_sticky_and_inherited(spark, tmp_path):
    """r13 second-review finding 1: sketch_null_slot must not be
    laundered — an incremental refresh over a pre-sentinel table keeps
    False (only a rebuild re-sketches the full head and restores it),
    a cascade from a pre-sentinel fine tier inherits False, and the
    metadata doors exclude both."""
    import json
    import os

    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        cascade_quantile_sketch,
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 1200, seed=71), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    sk_root = str(tmp_path / "qs300")
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01,
        transform=_norm_shape(), transform_complete=True,
        transform_canonical=True,
    )
    sk = SnapshotCatalog(sk_root)
    assert sk.manifest()["sketch_null_slot"] is True

    # simulate a PRE-SENTINEL table: strip the key from the head
    # manifest (legacy manifests never carried it)
    head = sk.current_version()
    mpath = os.path.join(sk_root, "_snapshots", f"v{head:06d}.json")
    man = json.load(open(mpath))
    man.pop("sketch_null_slot")
    json.dump(man, open(mpath, "w"))
    assert "sketch_null_slot" not in sk.manifest()

    # a cascade from the "legacy" fine tier inherits the missing
    # property as False
    coarse = str(tmp_path / "qs3600")
    cascade_quantile_sketch(spark, sk_root, coarse, 3600, ["metric_name"],
                            0.01)
    assert SnapshotCatalog(coarse).manifest()["sketch_null_slot"] is False

    # incremental refresh (disjoint later buckets) stays False...
    write_metrics(
        normalize_to_metrics(
            _sk_batch(spark, 1200, 1800, seed=71), "ts_ns", "name", "v"
        ),
        path,
    )
    cat.commit_new_files()
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01,
        transform=_norm_shape(), transform_complete=True,
        transform_canonical=True,
    )
    assert sk.manifest()["sketch_null_slot"] is False
    # ...and the metadata doors refuse it
    eng = CardinalSin(spark, path)
    eng.attach_quantile_sketch(sk_root, 300, alpha=0.01)
    assert eng._route_sketches() == []
    # a rewrite-shaped base commit rebuilds the full head → restored
    cat.compact(spark, target_files=1)
    refresh_quantile_sketch(
        spark, cat, sk_root, 300, ["metric_name"], 0.01,
        transform=_norm_shape(), transform_complete=True,
        transform_canonical=True,
    )
    assert sk.manifest()["sketch_null_slot"] is True
    eng2 = CardinalSin(spark, path)
    eng2.attach_quantile_sketch(sk_root, 300, alpha=0.01)
    assert eng2._route_sketches()


def test_sql_sketch_door_keeps_all_null_groups(spark, tmp_path):
    """r13 second-review finding 2: a (bucket, metric) whose in-range
    samples are all NULL must appear in the routed result with a NULL
    estimate — exactly the raw plan's row set."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    src = spark.createDataFrame(
        [
            (
                (START + i) * 10**9,
                "m" + str(i % 2),
                None if i % 2 == 1 else float(1 + i % 7),
            )
            for i in range(1200)
        ],
        "ts_ns long, name string, v double",
    )
    path = str(tmp_path / "metrics")
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    eng = CardinalSin(spark, path)
    shaped = eng.metrics.withColumn("value", value_expr())
    shaped.createOrReplaceTempView("metrics")
    sp = str(tmp_path / "qs300")
    downsample_quantile_sketch(shaped, 300, ["metric_name"], 0.01)\
        .write.parquet(sp)
    _prove_sketch(sp, 300)
    eng.attach_quantile_sketch(sp, 300, alpha=0.01)
    start, end = START, START + 1199
    q = (
        "SELECT time_bucket(timestamp, 600) AS tb, metric_name, "
        "approx_percentile(value, 0.9) AS p90 FROM metrics "
        f"WHERE timestamp >= timestamp_seconds({start}) "
        f"AND timestamp <= timestamp_seconds({end}) "
        "GROUP BY tb, metric_name ORDER BY tb, metric_name"
    )
    out = eng.sql(q)
    assert all("qs300" in f for f in out.inputFiles())
    rows = out.collect()
    # raw row set: both metrics in every bucket; m1's estimate is NULL
    raw = spark.sql(
        q.replace("time_bucket(timestamp, 600)",
                  "timestamp_seconds(CAST(floor(unix_timestamp(timestamp)"
                  "/600)*600 AS BIGINT))")
    ).collect()
    assert [(r.tb, r.metric_name) for r in rows] == [
        (r.tb, r.metric_name) for r in raw
    ]
    for r in rows:
        if r.metric_name == "m1":
            assert r.p90 is None
        else:
            assert r.p90 is not None


def test_promql_range_approx_quantile_routed(spark, tmp_path):
    """VERDICT r13 item 2: promql_range(..., approx_quantile_alpha=α)
    routes quantile_over_time grids to a matching attached sketch —
    inputFiles pinned to the sketch, bit-equal to the raw arm (both
    build the same slot counts), estimate within α of the exact
    nearest-rank quantile, and the last_quantile_route contract loud on
    both arms. The default (no flag) keeps exact PromQL evaluation."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.functions.core import time_bucket
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 3600, seed=73), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    SnapshotCatalog(path).init_from_directory()
    eng = CardinalSin(spark, path)
    sk_root = str(tmp_path / "qs300")
    eng.refresh_quantile_sketch(sk_root, 300, series_cols=["metric_name"])
    eng.attach_quantile_sketch(sk_root, 300, alpha=0.01)
    start, end, step = START, START + 3600 - 1, 600
    pq = "quantile_over_time(0.9, m[600s])"

    routed = eng.promql_range(pq, start, end, step,
                              approx_quantile_alpha=0.01)
    assert eng.last_quantile_route["routed"] is True
    assert eng.last_quantile_route["path"] == sk_root
    files = routed.inputFiles()
    assert files and all("qs300" in f for f in files)
    got = routed.collect()
    assert [c for c in routed.columns] == ["time_bucket", "metric_name",
                                           "value"]

    # raw arm (no sketch attached): bit-equal, loud unrouted contract
    raw_eng = CardinalSin(spark, path)
    raw = raw_eng.promql_range(pq, start, end, step,
                               approx_quantile_alpha=0.01)
    assert raw_eng.last_quantile_route["routed"] is False
    assert "raw" in raw_eng.last_quantile_route["reason"]
    assert got == raw.collect()

    # same grid through quantile_approx — the doors share the code path
    assert got == eng.quantile_approx("m", 0.9, start, end, step).collect()

    # estimate within α of the exact nearest-rank per-bucket quantile
    exact = {
        r["time_bucket"]: r["p"]
        for r in eng.metrics.filter(F.col("metric_name") == "m")
        .groupBy(time_bucket("timestamp", step).alias("time_bucket"))
        .agg(F.expr("sort_array(collect_list(value_f64))").alias("vs"))
        .select(
            "time_bucket",
            F.element_at(
                "vs",
                (F.floor(F.lit(0.9) * (F.size("vs") - 1)) + 1).cast("int"),
            ).alias("p"),
        )
        .collect()
    }
    assert len(got) == len(exact) == 6
    for r in got:
        e = exact[r["time_bucket"]]
        assert abs(r["value"] - e) <= 0.01 * abs(e) + 1e-12, (r, e)

    # the DEFAULT stays the exact interpolated evaluation (no sketch
    # route — different estimator, so values legitimately differ)
    exact_door = eng.promql_range(pq, start, end, step)
    assert exact_door.count() == 6
    assert not any("qs300" in f for f in exact_door.inputFiles())


def test_promql_range_approx_quantile_loud_rejections(spark, tmp_path):
    """The approx flag is never silent: any shape the sketch estimator
    has no semantics for raises instead of quietly answering a different
    question."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    path = str(tmp_path / "m")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 60, seed=5), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    s, e = START, START + 600 - 1
    with pytest.raises(ValueError, match="only applies to plain"):
        eng.promql_range("rate(m[300s])", s, e, 300,
                         approx_quantile_alpha=0.01)
    with pytest.raises(ValueError, match="approx_quantile_alpha"):
        eng.promql_range("sum(quantile_over_time(0.9, m[300s]))", s, e,
                         300, approx_quantile_alpha=0.01)
    with pytest.raises(ValueError, match="offset/@"):
        eng.promql_range("quantile_over_time(0.9, m[300s] offset 5m)",
                         s, e, 300, approx_quantile_alpha=0.01)
    with pytest.raises(ValueError, match="at_version"):
        eng.promql_range("quantile_over_time(0.9, m[300s])", s, e, 300,
                         approx_quantile_alpha=0.01, at_version=0)
    with pytest.raises(ValueError, match="window == step"):
        eng.promql_range("quantile_over_time(0.9, m[900s])", s, e, 300,
                         approx_quantile_alpha=0.01)
    # none of the rejected queries fed the advisor (ADVICE r13 #4)
    assert eng._range_log == []


def test_streaming_sink_sketch_maintenance(spark, tmp_path):
    """VERDICT r13 item 4 — the sketch twin of the moment-rollup
    pyramid streaming test: snapshot_ingest_sink's on_commit hook
    refreshes the fine quantile sketch AND cascades the coarse tier per
    micro-batch; after every batch both tiers are bit-equal to a direct
    sketch of the table, serving routes through the fine tier, a batch
    landing WITHOUT a refresh serves bit-equal through the fresh='union'
    arm (sketch rows ∪ the delta's slot counts, delta files only), and
    a replayed batch leaves both tiers untouched."""
    import os

    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        cascade_quantile_sketch,
        downsample_quantile_sketch,
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import normalize_to_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root = str(tmp_path / "t")
    fine = str(tmp_path / "qs300")
    coarse = str(tmp_path / "qs3600")
    os.makedirs(root)
    cat = SnapshotCatalog(root)
    reshape = lambda df: df.withColumn("value", value_expr())  # noqa: E731

    def hook(version: int) -> None:
        refresh_quantile_sketch(
            spark, cat, fine, 300, ["metric_name"],
            transform=reshape, transform_complete=True,
            transform_canonical=True,
        )
        cascade_quantile_sketch(spark, fine, coarse, 3600, ["metric_name"])

    def batch(lo, hi, metric="a"):
        src = spark.range(lo, hi).select(
            (
                F.lit(START * 1_000_000_000)
                + (F.col("id") % 7200) * F.lit(10**9)
            ).alias("ts_ns"),
            F.lit(metric).alias("name"),
            (F.col("id") % 7 + 1).cast("double").alias("v"),
        )
        return normalize_to_metrics(src, "ts_ns", "name", "v")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def check_tiers():
        base = reshape(cat.read(spark))
        for res, path in ((300, fine), (3600, coarse)):
            got = rows(SnapshotCatalog(path).read(spark))
            want = rows(
                downsample_quantile_sketch(base, res, ["metric_name"], 0.01)
            )
            assert got == want, res

    sink = snapshot_ingest_sink(root, on_commit=hook)
    sink(batch(0, 2000, "a"), 0)
    check_tiers()
    sink(batch(2000, 3500, "b"), 1)
    check_tiers()

    # fresh serving: quantile_approx reads the fine tier only, bit-equal
    # to the raw arm
    start, end, step = START, START + 7200 - 1, 600
    eng = CardinalSin(spark, root)
    eng.attach_quantile_sketch(fine, 300, alpha=0.01)
    served = eng.quantile_approx('{__name__=~".+"}', 0.9, start, end, step)
    assert all("qs300" in f for f in served.inputFiles())
    raw = CardinalSin(spark, root)
    assert served.collect() == raw.quantile_approx(
        '{__name__=~".+"}', 0.9, start, end, step
    ).collect()

    # a batch landing with NO refresh: the union arm serves sketch rows
    # ∪ the CDC delta's slot counts — bit-equal to raw, reading the fine
    # tier plus ONLY the new batch's stream files
    snapshot_ingest_sink(root)(batch(3500, 4200, "c"), 2)
    ueng = CardinalSin(spark, root)
    ueng.attach_quantile_sketch(fine, 300, alpha=0.01, fresh="union")
    got = ueng.quantile_approx('{__name__=~".+"}', 0.9, start, end, step)
    # the route dict discloses the union arm (r14 review: a caller
    # using it to confirm a sketch-only scan must not be misled)
    assert ueng.last_quantile_route["routed"] is True
    assert ueng.last_quantile_route["union"] is True
    assert "delta" in ueng.last_quantile_route["reason"]
    assert eng.last_quantile_route["union"] is False  # the fresh serve
    files = got.inputFiles()
    assert any("qs300" in f for f in files)
    base_files = [f for f in files if "qs300" not in f]
    assert base_files and all("stream-00000002" in f for f in base_files)
    raw2 = CardinalSin(spark, root)
    assert got.collect() == raw2.quantile_approx(
        '{__name__=~".+"}', 0.9, start, end, step
    ).collect()

    # replayed batch: rows already durable, hook not fired, tiers intact
    fine_v = SnapshotCatalog(fine).current_version()
    coarse_v = SnapshotCatalog(coarse).current_version()
    sink(batch(2000, 3500, "b"), 1)
    assert SnapshotCatalog(fine).current_version() == fine_v
    assert SnapshotCatalog(coarse).current_version() == coarse_v


def test_advisor_cascade_recommendation_and_apply(spark, tmp_path):
    """VERDICT r13 item 5: a workload with divisor-structured steps
    (5m-ish / 1h / 1d) produces a kind='cascade' recommendation per
    tier type, apply_recommendation materializes the pyramid (fine from
    raw, coarse tiers from the fine tier) under root/r<res> and attaches
    every tier, and re-asking shows already_attached flipping per tier."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_sk_batch(spark, 0, 3600, seed=41), "ts_ns",
                             "name", "v"), path, mode="overwrite",
    )
    SnapshotCatalog(path).init_from_directory()
    eng = CardinalSin(spark, path)
    day_end = START + 86400 - 1
    # multi-scale dashboard fleet: the same metric at 5m-ish, 1h, 1d
    for step in (300, 3600, 86400):
        eng.promql_range("sum(m)", START, day_end, step)
        eng.quantile_approx("m", 0.9, START, day_end, step)
    recs = eng.recommend_rollups()
    cas = {
        r["base_kind"]: r for r in recs if r["kind"] == "cascade"
    }
    assert set(cas) == {"moment", "quantile_sketch"}
    for r in cas.values():
        assert r["resolutions_s"] == [300, 3600, 86400]
        assert r["serves"] == 3 and r["of"] == 3
        assert not r["already_attached"]
        assert [t["resolution_s"] for t in r["tiers"]] == [300, 3600, 86400]
    assert cas["quantile_sketch"]["alpha"] == 0.01

    # attach ONE tier by hand: the cascade's per-tier flags flip
    # individually, the pyramid flag stays False
    pre = str(tmp_path / "pre3600")
    eng.refresh_rollup(pre, 3600, series_cols=["metric_name"])
    eng.attach_rollup(pre, 3600)
    half = [
        r
        for r in eng.recommend_rollups()
        if r["kind"] == "cascade" and r["base_kind"] == "moment"
    ][0]
    assert [t["already_attached"] for t in half["tiers"]] == [
        False, True, False,
    ]
    assert not half["already_attached"]

    # apply both pyramids: fine refreshes from raw, coarse tiers cascade
    # from the fine tier (never raw), every tier attaches
    mroot, qroot = str(tmp_path / "mom"), str(tmp_path / "qs")
    eng.apply_recommendation(cas["moment"], mroot,
                             series_cols=["metric_name"])
    eng.apply_recommendation(cas["quantile_sketch"], qroot,
                             series_cols=["metric_name"])
    for r in (300, 3600, 86400):
        assert SnapshotCatalog(
            f"{mroot}/r{r}"
        ).manifest()["rollup_resolution_s"] == r
        assert SnapshotCatalog(
            f"{qroot}/r{r}"
        ).manifest()["sketch_alpha"] == 0.01
    # coarse tiers chain off the fine tier, not the metrics table
    for root in (mroot, qroot):
        man = SnapshotCatalog(f"{root}/r3600").manifest()
        assert man["rollup_base_root"].endswith("r300")
        man = SnapshotCatalog(f"{root}/r86400").manifest()
        assert man["rollup_base_root"].endswith("r3600")
    after = {
        r["base_kind"]: r
        for r in eng.recommend_rollups()
        if r["kind"] == "cascade"
    }
    for r in after.values():
        assert r["already_attached"]
        assert all(t["already_attached"] for t in r["tiers"])

    # and the pyramid actually serves: the 1d queries read the 1d tier
    got = eng.promql_range("sum(m)", START, day_end, 86400)
    assert got.inputFiles() and all(
        "r86400" in f for f in got.inputFiles()
    )
    got = eng.quantile_approx("m", 0.9, START, day_end, 86400)
    assert got.inputFiles() and all(
        "r86400" in f for f in got.inputFiles()
    )
    # re-applying the same recommendation must not duplicate attach
    # entries (r14 review: each duplicate re-reads its manifest — and
    # rebuilds union frames — on every subsequent query)
    n_roll, n_sk = len(eng._attached_rollups), len(eng._attached_sketches)
    eng.apply_recommendation(cas["moment"], mroot,
                             series_cols=["metric_name"])
    eng.apply_recommendation(cas["quantile_sketch"], qroot,
                             series_cols=["metric_name"])
    assert len(eng._attached_rollups) == n_roll
    assert len(eng._attached_sketches) == n_sk
    # a non-chain recommendation is refused loudly — including equal
    # adjacent resolutions, which would cascade a tier FROM ITSELF
    for bad in ([300, 420], [300, 300], [3600, 300]):
        with pytest.raises(ValueError, match="divisor chain"):
            eng.apply_recommendation(
                {"kind": "cascade", "base_kind": "moment",
                 "resolutions_s": bad},
                str(tmp_path / "bad"),
            )
