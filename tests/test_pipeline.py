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


def test_every_stage_runs_standalone(spark, docs, tmp_path):
    small = docs.limit(50)
    bench = str(tmp_path / "bench")
    small.limit(2).select("doc_id", "text").write.parquet(bench)
    # stages needing non-default params to be meaningful standalone
    params: dict[str, dict] = {"decontaminate": {"benchmark": bench}}
    for name, fn in STAGES.items():
        out = fn(small, {"stage": name, **params.get(name, {})})
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


def test_pipeline_decontaminate_span_dedup_pack(spark, sf_dir, tmp_path):
    """The three round-9 stages compose: a benchmark built FROM corpus
    docs must knock exactly those docs out; span_dedup rewrites text;
    pack_shards appends exact stream offsets/shard ids and preserves
    every upstream column."""
    from cardinalsin_spark.pipeline import run_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # benchmark = 5 lowest-id corpus docs, verbatim -> guaranteed overlap
    bench_path = str(tmp_path / "benchmark")
    docs.orderBy("doc_id").limit(5).select("doc_id", "text").write.parquet(
        bench_path
    )
    n_in = docs.count()
    out, report = run_pipeline(
        spark,
        docs,
        [
            {"stage": "decontaminate", "benchmark": bench_path},
            {"stage": "span_dedup", "span_tokens": 10},
            {"stage": "pack_shards", "capacity_tokens": 512},
        ],
    )
    rows = {r["stage"]: r.get("rows") for r in report}
    assert rows["decontaminate"] <= n_in - 5  # the 5 clones are gone
    assert rows["pack_shards"] == rows["span_dedup"]  # packing drops nothing
    cols = set(out.columns)
    assert {"doc_id", "text", "n_tokens", "stream_offset", "shard"} <= cols
    got = out.select("stream_offset", "n_tokens", "shard").orderBy(
        "stream_offset"
    ).collect()
    # offsets are an exact exclusive prefix sum of token counts
    acc = 0
    for r in got:
        assert r.stream_offset == acc
        assert r.shard == acc // 512
        acc += r.n_tokens

    import pytest as _pytest

    with _pytest.raises(ValueError, match="benchmark"):
        run_pipeline(spark, docs, [{"stage": "decontaminate"}])
