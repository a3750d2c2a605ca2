"""cardinalsin_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Rust TSDB ("CardinalSin",
jeremyudis/cardinalsin).

The reference is a serverless high-cardinality time-series database whose
query layer delegates to DataFusion over Parquet (reference
``query/engine.rs:252-256``); its own value-add is the storage/catalog layer,
the PromQL→SQL transpiler, write path, compaction and streaming merge. This
package re-expresses all of that Spark-first:

- ``session``      — tuned SparkSession factory (AQE, shuffle partitions, Arrow)
- ``schema``       — the wide ``metrics`` table schema (labels-as-columns)
- ``sources``      — parquet table catalog + metrics ingest/normalize/write path
- ``operators``    — time-series ops (bucketing, rate, latest-point, top-k,
                     dedup), relational pass-through, compaction/retention,
                     LLM-pipeline ops (dedup, similarity, text, multimodal)
- ``functions``    — reusable column expressions (time bucketing, label
                     matchers, hashing, vector math)
- ``streaming``    — Structured Streaming historical+live merge
- ``plans``        — plan-inspection helpers (pushdown/pruning assertions)

Everything avoids ``collect()`` in operator paths, keeps expressions inside
whole-stage codegen where possible, and is written for a 1000-executor
cluster even though tests run on ``local[*]``.
"""

__version__ = "0.1.0"
