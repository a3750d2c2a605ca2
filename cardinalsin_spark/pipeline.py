"""Declarative corpus-preparation pipeline: a JSON list of stages over the
documents schema, each mapping to an already-tested operator, with per-stage
row accounting.

    python -m cardinalsin_spark.pipeline \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --config pipeline.json --output /tmp/clean

    pipeline.json:
    [
      {"stage": "exact_dedup"},
      {"stage": "near_dedup_cc", "threshold": 0.6},
      {"stage": "quality_filter", "min_tokens": 20},
      {"stage": "lang_filter", "keep": ["en"]},
      {"stage": "pii_scrub"},
      {"stage": "split_assign", "weights": {"train": 0.9, "val": 0.05,
                                            "test": 0.05}},
      {"stage": "mixture_sample", "rates": {"src0": 2.0}},
      {"stage": "temperature_mixture", "alpha": 0.5},
      {"stage": "chunk_windows", "chunk_tokens": 64, "overlap": 16}
    ]

This is the productized form of the north-star LLM operators — the one
command a data team runs nightly. Stages stay LAZY end-to-end (one Spark
job at the final write; Catalyst fuses the narrow stages); the per-stage
row counts in the returned report are the only extra actions, and
``count_rows=False`` skips them for production runs. The reference has no
pipeline surface at all — its only jobs are compaction loops
(``compactor/mod.rs``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_exact_dedup(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.dedup_docs import exact_dedup

    keep = exact_dedup(df).select("doc_id")
    return df.join(keep, "doc_id", "leftsemi")


def _stage_near_dedup_cc(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.dedup_docs import near_dedup_cc

    return near_dedup_cc(df, threshold=p.get("threshold", 0.6))


def _stage_quality_filter(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.sampling import quality_filter

    kwargs = {k: v for k, v in p.items() if k != "stage"}
    gated = quality_filter(df, **kwargs)
    return gated.filter(F.col("keep")).select(*df.columns)


def _stage_lang_filter(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.text import lang_id

    keep = p.get("keep", ["en"])
    return (
        lang_id(df)
        .filter(F.col("lang_pred").isin(*keep))
        .select(*df.columns)
    )


def _stage_pii_scrub(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.text import pii_scrub

    out = pii_scrub(df)
    # the scrubbed text REPLACES the raw text downstream
    return out.withColumn("text", F.col("scrubbed")).select(*df.columns)


def _stage_split_assign(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.sampling import split_expr

    return df.withColumn(
        "split",
        split_expr(weights=p.get("weights"), seed=p.get("seed", 42)),
    )


def _stage_mixture_sample(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.sampling import mixture_sample

    return mixture_sample(
        df, p.get("rates", {}), seed=p.get("seed", 13),
        default_rate=p.get("default_rate", 1.0),
    )


def _stage_temperature_mixture(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.sampling import temperature_mixture

    return temperature_mixture(
        df, alpha=p.get("alpha", 0.5), seed=p.get("seed", 13)
    )


def _stage_chunk_windows(df: DataFrame, p: dict) -> DataFrame:
    from cardinalsin_spark.operators.sampling import chunk_windows

    return chunk_windows(
        df,
        chunk_tokens=p.get("chunk_tokens", 64),
        overlap=p.get("overlap", 16),
    )


def _stage_span_dedup(df: DataFrame, p: dict) -> DataFrame:
    """Rewrite every document's text with corpus-duplicate spans removed
    (C4-style keep-first); non-text columns carry through."""
    from cardinalsin_spark.operators.dedup_docs import span_dedup

    rebuilt = span_dedup(
        df, span_tokens=p.get("span_tokens", 10), emit_text=True
    ).withColumnRenamed("text", "_rebuilt")
    return (
        df.join(rebuilt, "doc_id")
        .withColumn("text", F.col("_rebuilt"))
        .drop("_rebuilt")
    )


def _stage_decontaminate(df: DataFrame, p: dict) -> DataFrame:
    """Drop corpus documents sharing a winnowing fingerprint with ANY
    document in an external benchmark set (``benchmark`` = parquet path
    with doc_id/text) — the GPT-3-appendix-C audit as a pipeline stage.
    The benchmark side is the protected "train" role of
    cross_split_contamination; flagged corpus docs anti-join out."""
    from cardinalsin_spark.operators.dedup_docs import (
        cross_split_contamination,
    )

    path = p.get("benchmark")
    if not path:
        raise ValueError("decontaminate stage needs a 'benchmark' path")
    bench = df.sparkSession.read.parquet(path).select(
        F.concat(F.lit("bench:"), F.col("doc_id").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )
    corpus = df.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    # the split label must be an expression of doc_id (the contamination
    # op re-derives it after its fingerprint projection) — the bench:
    # prefix carries the role through
    role = F.when(
        F.col("doc_id").startswith("bench:"), F.lit("train")
    ).otherwise(F.lit("test"))
    flagged = cross_split_contamination(
        corpus.unionByName(bench), role
    ).select(F.col("doc_id").alias("_bad"))
    return df.join(
        flagged, df["doc_id"].cast("string") == flagged["_bad"], "left_anti"
    )


def _stage_pack_shards(df: DataFrame, p: dict) -> DataFrame:
    """Assign each document its exact stream offset and fixed-capacity
    shard index (concat-and-chunk packing) — the terminal stage before
    the shard writer."""
    from cardinalsin_spark.operators.sampling import pack_stream_offsets

    with_tokens = df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    packed = pack_stream_offsets(
        with_tokens, capacity_tokens=p.get("capacity_tokens", 2048)
    )
    return packed


STAGES = {
    "exact_dedup": _stage_exact_dedup,
    "near_dedup_cc": _stage_near_dedup_cc,
    "span_dedup": _stage_span_dedup,
    "decontaminate": _stage_decontaminate,
    "quality_filter": _stage_quality_filter,
    "lang_filter": _stage_lang_filter,
    "pii_scrub": _stage_pii_scrub,
    "split_assign": _stage_split_assign,
    "mixture_sample": _stage_mixture_sample,
    "temperature_mixture": _stage_temperature_mixture,
    "chunk_windows": _stage_chunk_windows,
    "pack_shards": _stage_pack_shards,
}


def run_pipeline(
    spark: SparkSession,
    df: DataFrame,
    config: list[dict],
    count_rows: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Apply the configured stages in order. Returns (final frame, report);
    the report carries per-stage output row counts when ``count_rows``
    (each count is an extra job — disable for production runs where the
    write is the only action that matters)."""
    report: list[dict] = []
    if count_rows:
        report.append({"stage": "input", "rows": df.count()})
    for spec in config:
        name = spec.get("stage")
        if name not in STAGES:
            raise ValueError(
                f"unknown stage {name!r}; known: {sorted(STAGES)}"
            )
        t0 = time.time()
        df = STAGES[name](df, spec)
        rec: dict = {"stage": name}
        if count_rows:
            rec["rows"] = df.count()
            rec["sec"] = round(time.time() - t0, 3)
        report.append(rec)
    return df, report


def main(argv: list[str] | None = None) -> int:
    from cardinalsin_spark.session import get_spark

    p = argparse.ArgumentParser(prog="cardinalsin-pipeline")
    p.add_argument("--input", required=True)
    p.add_argument("--config", required=True, help="JSON stage list")
    p.add_argument("--output", required=True)
    p.add_argument("--no-counts", action="store_true")
    args = p.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)
    spark = get_spark()
    df = spark.read.parquet(args.input)
    out, report = run_pipeline(
        spark, df, config, count_rows=not args.no_counts
    )
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"stages": report, "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
