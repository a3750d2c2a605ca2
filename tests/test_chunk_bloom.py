"""Per-chunk Bloom file pruning: the reference README's per-chunk bloom
claim (disabled in its writer — SURVEY §1.4) shipped for real as a
catalog-sized sidecar. Contract: candidate_files is a guaranteed superset
of the files containing the value (no false negatives, ever), pruning
actually skips files, and the pruned read is bit-identical to the full
filter."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """16 metrics spread over 8 files, partitioned so each file holds only
    two metrics — pruning has something to skip."""
    root = str(tmp_path_factory.mktemp("bloomtbl") / "tbl")
    (
        spark.range(0, 4000)
        .select(
            F.concat(F.lit("metric_"), (F.col("id") % 16)).alias("metric_name"),
            (F.col("id") % 97).alias("value"),
            F.col("id"),
        )
        .repartition(8, (F.col("id") % 16) / 2)
        .write.parquet(root)
    )
    idx = ChunkBloomIndex(root)
    idx.build(spark)
    return root, idx


def test_no_false_negatives_every_metric(spark, bloom_table):
    root, idx = bloom_table
    truth = (
        spark.read.parquet(root)
        .select(F.input_file_name().alias("f"), "metric_name")
        .distinct()
        .collect()
    )
    holds: dict = {}
    for r in truth:
        holds.setdefault(r.metric_name, set()).add(idx._rel(r.f))
    for name, files in holds.items():
        cands = set(idx.candidate_files(spark, name))
        assert files <= cands, (name, files - cands)


def test_pruning_skips_files_and_result_exact(spark, bloom_table):
    root, idx = bloom_table
    n_files = len(json.load(open(idx.path))["files"])
    assert n_files >= 4
    name = "metric_3"
    cands = idx.candidate_files(spark, name)
    # at 64 Ki bits / ~2 keys per file the fp rate is ~0: expect a real skip
    assert 0 < len(cands) < n_files
    got = sorted(
        (r.id, r.value) for r in idx.read_matching(spark, name).collect()
    )
    want = sorted(
        (r.id, r.value)
        for r in spark.read.parquet(root)
        .filter(F.col("metric_name") == name)
        .collect()
    )
    assert got == want and got


def test_absent_value_reads_nothing(spark, bloom_table):
    root, idx = bloom_table
    assert idx.candidate_files(spark, "metric_nope") == []
    df = idx.read_matching(spark, "metric_nope")
    assert df.count() == 0
    # schema matches the table so downstream unions never branch
    assert set(df.columns) == {"metric_name", "value", "id"}


def test_param_mismatch_is_loud(spark, bloom_table):
    root, _ = bloom_table
    with pytest.raises(ValueError, match="hash parameters"):
        ChunkBloomIndex(root, m_bits=1 << 12).candidate_files(spark, "m")
    with pytest.raises(ValueError, match="column"):
        ChunkBloomIndex(root, column="value").candidate_files(spark, "m")


def test_sidecar_is_underscore_hidden(spark, bloom_table):
    """The sidecar must not break a plain root read (Spark skips _*)."""
    root, idx = bloom_table
    assert os.path.basename(idx.path).startswith("_")
    assert spark.read.parquet(root).count() == 4000


def test_bloom_job_cli(spark, bloom_table, capsys):
    """`python -m cardinalsin_spark.jobs bloom --path ...` rebuilds the
    sidecar in place."""
    from cardinalsin_spark import jobs

    root, idx = bloom_table
    os.remove(idx.path)
    rc = jobs.main(["bloom", "--path", root])
    assert rc == 0 and os.path.exists(idx.path)
    assert "bloom sidecar" in capsys.readouterr().out
    assert idx.candidate_files(spark, "metric_0")


def test_bloom_membership_property(spark, tmp_path):
    """Property: for randomized key sets, every key written to a file is
    found in that file's candidate list (no false negatives — the pruning
    safety invariant), including keys with quotes/unicode/whitespace."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    key = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1,
        max_size=24,
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(key, min_size=1, max_size=12, unique=True))
    def check(keys):
        import shutil
        import uuid

        root = str(tmp_path / f"t{uuid.uuid4().hex[:8]}")
        spark.createDataFrame(
            [(k, i) for i, k in enumerate(keys)], "metric_name string, v long"
        ).coalesce(1).write.parquet(root)
        idx = ChunkBloomIndex(root, m_bits=1 << 10, k_hashes=3)
        idx.build(spark)
        for k in keys:
            cands = idx.candidate_files(spark, k)
            assert cands, (k,)
            assert idx.read_matching(spark, k).count() == 1
        shutil.rmtree(root)

    check()


def test_engine_point_lookup_uses_sidecar(spark, bloom_table):
    """engine.point_lookup prunes through the sidecar when present
    (adopting its parameters via ChunkBloomIndex.open) and falls back to
    a plain filtered read without one — same rows either way."""
    from cardinalsin_spark.engine import CardinalSin

    root, idx = bloom_table
    eng = CardinalSin(spark, metrics_path=root)
    got = eng.point_lookup("metric_5")
    want = (
        spark.read.parquet(root)
        .filter(F.col("metric_name") == "metric_5")
        .count()
    )
    assert got.count() == want and want > 0
    # non-default-params sidecar: open() adopts them, probe still works
    idx2 = ChunkBloomIndex(root, m_bits=1 << 12, k_hashes=2)
    idx2.build(spark)
    assert eng.point_lookup("metric_5").count() == want
    os.remove(idx2.path)
    assert eng.point_lookup("metric_5").count() == want  # plain fallback
