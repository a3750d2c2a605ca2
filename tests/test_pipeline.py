"""End-to-end declarative pipeline: stage wiring, row accounting,
monotonic filtering, CLI config parsing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.pipeline import STAGES, run_pipeline


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


CONFIG = [
    {"stage": "exact_dedup"},
    {"stage": "quality_filter", "min_tokens": 20},
    {"stage": "pii_scrub"},
    {"stage": "split_assign", "weights": {"train": 0.9, "val": 0.05,
                                          "test": 0.05}},
    {"stage": "chunk_windows", "chunk_tokens": 64, "overlap": 16},
]


def test_pipeline_end_to_end(spark, docs):
    out, report = run_pipeline(spark, docs, CONFIG)
    by_stage = {r["stage"]: r for r in report}
    n_in = by_stage["input"]["rows"]
    # filters only shrink
    assert by_stage["exact_dedup"]["rows"] <= n_in
    assert by_stage["quality_filter"]["rows"] <= by_stage["exact_dedup"]["rows"]
    # pii/split are 1:1
    assert by_stage["pii_scrub"]["rows"] == by_stage["quality_filter"]["rows"]
    assert by_stage["split_assign"]["rows"] == by_stage["pii_scrub"]["rows"]
    # chunking expands
    assert by_stage["chunk_windows"]["rows"] >= by_stage["split_assign"]["rows"]
    rows = out.limit(5).collect()
    assert {"doc_id", "chunk_idx", "chunk_md5"} <= set(out.columns)
    assert rows


def test_pipeline_deterministic(spark, docs):
    a, _ = run_pipeline(spark, docs, CONFIG, count_rows=False)
    b, _ = run_pipeline(spark, docs, CONFIG, count_rows=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unknown_stage_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown stage"):
        run_pipeline(spark, docs, [{"stage": "nope"}], count_rows=False)


def test_every_stage_runs_standalone(spark, docs):
    small = docs.limit(50)
    for name, fn in STAGES.items():
        out = fn(small, {"stage": name})
        assert out.limit(1).collect() is not None, name


def test_cli_main(spark, docs, tmp_path):
    from cardinalsin_spark import pipeline as pl

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps([{"stage": "exact_dedup"},
                               {"stage": "split_assign"}]))
    inp = tmp_path / "in.parquet"
    docs.limit(100).write.parquet(str(inp))
    rc = pl.main([
        "--input", str(inp), "--config", str(cfg),
        "--output", str(tmp_path / "out"), "--no-counts",
    ])
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert "split" in out.columns and out.count() > 0
