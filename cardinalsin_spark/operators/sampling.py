"""Deterministic sampling / split / filter operators for training-data
pipelines.

A 100 TB corpus job cannot use nondeterministic sampling (``rand()`` changes
under retry/AQE re-computation, and a re-run must reproduce the same split):
every operator here derives its randomness from the portable md5 hash of a
stable row id, so results are bit-stable across runs, engines, and partition
layouts, and each doc's assignment is independent of every other row (pure
narrow map — no shuffle for the split/filter ops).

The reference engine has no sampling surface at all (its product queries are
scan/filter/aggregate over metrics, ``query/engine.rs:252-256``); these are
the corpus-preparation operators a training-data pipeline layers on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cardinalsin_spark.operators.dedup_docs import portable_hash


def split_expr(
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    buckets: int = 10_000,
) -> Column:
    """The split label as a pure COLUMN EXPRESSION over the id — so any
    frame keyed by the same id can recompute its split locally (a narrow
    map) instead of joining the assignment table. This is the 100 TB form:
    :func:`split_assign` is just ``withColumn(label, split_expr(...))``."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = portable_hash(seed, F.col(id_col).cast("string")) % F.lit(buckets)
    expr: Column | None = None
    cum = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        cum += weights[name] / total
        bound = int(cum * buckets)
        cond = bucket < F.lit(bound)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    fallback = F.lit(labels[-1])
    return fallback if expr is None else expr.otherwise(fallback)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    buckets: int = 10_000,
    label_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id.

    ``bucket = portable_hash(seed, id) mod buckets`` → label by cumulative
    weight thresholds (floor(cum_weight * buckets) boundaries, exact integer
    compare). Properties that matter at corpus scale:

    - narrow map, zero shuffle: assignment never moves data;
    - stable under append: adding new docs never re-assigns old ones
      (unlike ``randomSplit``, which depends on partition layout);
    - leakage-safe joins: any table keyed by the same id can recompute the
      split locally instead of joining the assignment.
    """
    return df.withColumn(
        label_col, split_expr(id_col, weights, seed, buckets)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` docs with the
    smallest ``portable_hash(seed, id)`` per stratum (ties broken by id).

    Hash-ordering makes the sample uniform-without-replacement per stratum
    yet reproducible. Executes as one shuffle on the strata columns plus a
    per-partition sort (window ``row_number``); Spark's window TopK pushes
    a group-limit before the final sort at scale, and a skewed stratum is
    bounded by the partial `rank <= n` filter AQE applies after the
    partial sort.
    """
    h = portable_hash(seed, F.col(id_col).cast("string"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(n_per_stratum))
        .drop("_rn")
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_punct_density: float = 0.2,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Gopher-style composite quality gate over the cheap text signals
    (length / mean word length / symbol density / stopword presence —
    the standard corpus-filter rule family). Pure built-in expressions,
    zero UDF, zero shuffle; emits the signal columns plus a ``keep``
    boolean and the per-rule failure flags so the filter is auditable
    (a corpus pipeline reports _why_ docs were dropped, not just counts).
    """
    from cardinalsin_spark.operators.text import quality_features

    out = quality_features(df, text_col)
    fails = {
        "fail_tokens": ~F.col("n_tokens").between(min_tokens, max_tokens),
        "fail_token_len": ~F.col("avg_token_len").between(
            min_avg_token_len, max_avg_token_len
        ),
        "fail_punct": F.col("punct_density") > F.lit(max_punct_density),
        "fail_stopwords": F.col("stopword_ratio") < F.lit(min_stopword_ratio),
    }
    keep = F.lit(True)
    for name, cond in fails.items():
        out = out.withColumn(name, cond)
        keep = keep & ~cond
    return out.withColumn("keep", keep)


def pack_stream_offsets(
    df: DataFrame,
    capacity_tokens: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_ranges: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents laid end-to-end in
    ``order_col`` order form one token stream; each doc gets its exact
    byte-0 ``stream_offset`` and the ``shard`` index
    ``floor(offset / capacity)`` — the deterministic shard assignment a
    pre-training pipeline uses to cut the stream into fixed-size examples.

    The global exclusive cumsum is computed with the parallel two-pass
    prefix-sum pattern, NOT a single-partition window: range-repartition on
    the order key, per-partition local cumsum (window keyed on the
    partition id — rows are already co-located, no extra shuffle), then
    per-partition totals (one bounded ``collect()`` of n_ranges rows)
    turned into exclusive partition offsets and added back via a broadcast
    map. The output is invariant to the sampled range boundaries because
    the cumsum only depends on the total order of ``order_col``. At 100 TB
    this is the textbook scalable prefix sum; a plain
    ``Window.orderBy(id)`` cumsum would serialize the corpus through one
    task.
    """
    spark = df.sparkSession
    n = n_ranges or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_part", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_part")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_ex = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    totals = sorted(
        (r["_part"], r["_t"])
        for r in ranged.groupBy("_part")
        .agg(F.sum(tokens_col).alias("_t"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for part, tot in totals:
        offsets[part] = acc
        acc += tot
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_part"),
    )
    return (
        ranged.withColumn("stream_offset", (local_ex + off_expr).cast("long"))
        .withColumn(
            "shard", F.expr(f"stream_offset div {capacity_tokens}").cast("long")
        )
        .drop("_part")
    )


def chunk_windows(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking (the RAG / pretraining preprocessing
    step that turns documents into fixed-size overlapping training
    windows): chunk i covers tokens [i·s, i·s + C) with stride
    s = C − overlap; windows start while i·s < n_tokens, the last one
    truncating at the document end.

    Pure narrow pipeline — tokenize once, ``sequence()`` the start
    offsets executor-side, explode, slice — no shuffle at all (chunking
    is embarrassingly parallel; any ordering/packing is a downstream
    concern). Chunk text is emitted as an md5 fingerprint plus token
    count: at 100 TB the chunk STREAM is what feeds the next stage, and
    carrying the full text through benchmarks/oracles would just
    re-materialize the corpus.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    from cardinalsin_spark.operators.text import normalize_text

    toks = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    return (
        toks.filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            "_n",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("_n") - 1, F.lit(stride)
                )
            ).alias("start_tok"),
        )
        .select(
            id_col,
            (F.col("start_tok") / F.lit(stride)).cast("long").alias("chunk_idx"),
            "start_tok",
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("start_tok")
            ).alias("n_chunk_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(F.col("_toks"), F.col("start_tok") + 1, chunk_tokens),
                )
            ).alias("chunk_md5"),
        )
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 13,
    buckets: int = 10_000,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic data-mixture resampling: each source gets a target
    rate — below 1 downsamples (keep iff hash bucket < rate·buckets, the
    split_expr discipline), above 1 upsamples by integer replication plus
    a hash-gated fractional copy (rate 2.3 → every doc twice, and a 30%
    deterministic subset a third time). The per-source reweighting every
    pretraining mix ships (source-balanced corpora à la The Pile /
    Dolma), with reproducibility under corpus append — no randomSplit,
    no state.

    Output = input rows replicated with an ``epoch`` column (0-based copy
    index) so downstream packing can interleave copies. Pure narrow map
    (explode of a per-row literal sequence) — no shuffle.
    """
    bucket = portable_hash(seed, F.col(id_col).cast("string")) % F.lit(buckets)
    n_copies: Column | None = None
    for src, rate in rates.items():
        whole = int(rate)
        frac_bound = int(round((rate - whole) * buckets))
        copies = F.lit(whole) + (bucket < F.lit(frac_bound)).cast("int")
        cond = F.col(source_col) == src
        n_copies = (
            F.when(cond, copies)
            if n_copies is None
            else n_copies.when(cond, copies)
        )
    d_whole = int(default_rate)
    d_frac = int(round((default_rate - d_whole) * buckets))
    default_copies = F.lit(d_whole) + (bucket < F.lit(d_frac)).cast("int")
    n_copies = (
        default_copies if n_copies is None else n_copies.otherwise(default_copies)
    )
    out = df.withColumn("_copies", n_copies).filter(F.col("_copies") > 0)
    return out.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)).alias("epoch")
    ).drop("_copies")


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 13,
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-based source rebalancing — the ``alpha`` knob of
    multilingual/multi-source pretraining mixes (mC4 / XLM-R style):
    target source shares ∝ n_s^alpha with the TOTAL corpus size
    preserved, so rate_s = N·n_s^alpha / (Σ_t n_t^alpha · n_s) — rare
    sources upsample (rate > 1), dominant ones downsample. Rates are
    DERIVED from the data (one tiny per-source count aggregate, broadcast
    back), then applied with the same deterministic hash-bucket
    replication discipline as :func:`mixture_sample`: whole copies +
    a fractional hash-gated copy, with the fractional gate compared as
    ``bucket < frac·buckets`` directly — no rounding step to disagree
    across engines.

    Determinism notes: alpha=0.5 uses ``sqrt`` (correctly-rounded IEEE —
    oracle-exact); other alphas go through ``pow`` (libm — keep them out
    of value-hash oracles per the SCALE.md doctrine). The cross-source
    weight sum is an ``array_sort`` + left-fold, so the float addition
    order is pinned regardless of partitioning (DuckDB mirror:
    ``list_reduce(list_sort(...))``).

    Output = input rows + ``epoch`` copy index; pure narrow map after one
    count aggregate over the sources (catalog-sized) — no data shuffle.
    """
    from cardinalsin_spark.operators.dedup_docs import portable_hash

    c = F.col("_n").cast("double")
    w = F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(float(alpha)))
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.withColumn("_w", w)
    tot = counts.agg(
        F.sum("_n").cast("double").alias("_total"),
        F.expr(
            "aggregate(array_sort(collect_list(_w)), CAST(0 AS DOUBLE),"
            " (a, x) -> a + x)"
        ).alias("_wsum"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        (
            F.col("_total") * F.col("_w")
            / (F.col("_wsum") * F.col("_n").cast("double"))
        ).alias("_rate"),
    )
    bucket = portable_hash(seed, F.col(id_col).cast("string")) % F.lit(buckets)
    whole = F.floor("_rate").cast("int")
    frac = (F.col("_rate") - F.floor("_rate")) * F.lit(float(buckets))
    out = (
        df.join(F.broadcast(rates), source_col)
        .withColumn(
            "_copies", whole + (bucket.cast("double") < frac).cast("int")
        )
        .filter(F.col("_copies") > 0)
    )
    return out.select(
        *df.columns,
        F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)).alias("epoch"),
    )
