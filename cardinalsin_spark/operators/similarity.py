"""Embedding similarity search: brute-force cosine top-k (baseline) and an
LSH-bucketed approximate variant (scale path). Beyond the reference's
surface — BASELINE.json north star.

Numerics: the oracle-checked path quantizes embeddings to an integer grid
(×10^6) so dot products and squared norms are *exact* int64 arithmetic
(64-dim ±1-ish floats → products ≤1e12, sums ≤6.4e13 « 2^63) and
accumulation order cannot perturb results; only the final
``dot / (sqrt(n2a)·sqrt(n2b))`` happens in floating point, identically on
both engines. A float fast path (``cosine_expr``) exists for production use.

Scale posture: top-k per query = broadcast the (small) query set, compute
scores in a map stage, then ``row_number`` per query — the shuffle carries
only per-query candidates. The LSH variant buckets on deterministic
random-hyperplane sign bits so candidate generation is a groupBy, not a
cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cardinalsin_spark.operators.dedup_docs import portable_hash

QUANT_SCALE = 1_000_000

# SQL-string forms of the vector primitives. Each plan-build py4j call costs
# ~1 ms of driver round-trip; the Column-API higher-order functions (lambda
# creation, per-literal Columns) made a single projection cost hundreds of
# calls — seconds of driver time per query *before* Catalyst ran. One
# ``selectExpr`` with generated SQL is a single round-trip and produces the
# identical expression tree.


def sql_quantize(col_sql: str, scale: int = QUANT_SCALE) -> str:
    """array<float> → array<bigint> on a fixed grid, as a SQL string."""
    return (
        f"transform({col_sql}, x -> CAST(round(CAST(x AS DOUBLE) * {scale})"
        f" AS BIGINT))"
    )


def sql_dot_q(a: str, b: str) -> str:
    """Exact integer dot product of quantized vectors, as a SQL string."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"


def sql_norm_q(a: str) -> str:
    """Euclidean norm of a quantized vector (one float step at the end)."""
    return f"sqrt(CAST({sql_dot_q(a, a)} AS DOUBLE))"


def quantize(vec: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<bigint> on a fixed grid (exact integer math)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        c, lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long")
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Quantized cosine: exact ints until one deterministic float step."""
    return dot_q(a, b).cast("double") / (
        F.sqrt(norm2_q(a).cast("double")) * F.sqrt(norm2_q(b).cast("double"))
    )


_DOT_UDF = None


def dot_q_vectorized() -> "Column":
    """Arrow-vectorized exact integer dot product (pandas_udf).

    For pairwise scoring the interpreted higher-order ``dot_q`` costs tens
    of µs per pair and gets re-evaluated when the same expression appears
    in both a Filter and a Project (no cross-operator CSE). The pandas UDF
    batches pairs through Arrow and runs one ``einsum`` per batch — int64
    all the way (exact: |q|≤1e6·dim ⇒ sums ≪ 2^63), cast to double at the
    end, so results are bit-identical to ``dot_q``. Python UDFs also plan
    as their own node, so the value is computed exactly once.

    The wrapper is built once per process (module cache) — pandas_udf
    creation is several py4j round-trips of plan-build latency."""
    global _DOT_UDF
    if _DOT_UDF is not None:
        return _DOT_UDF
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.values).astype(np.int64, copy=False)
        B = np.stack(b.values).astype(np.int64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", A, B).astype("float64"))

    _DOT_UDF = _dot
    return _dot


def cosine_expr(a: Column, b: Column) -> Column:
    """Float fast path (production): fused multiply-accumulate over doubles."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)


def cosine_topk_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbours per query vector (quantized cosine).

    ``queries`` has (query_id, vec). The query set broadcasts; scoring is a
    map-only stage over the corpus; per-query ranking is one window shuffle
    keyed by query_id.

    CONTRACT — small query set only. The crossJoin below is a deliberate
    cartesian product: cost is corpus × |queries|, so this is the exact
    *baseline* for a handful of probes (and the recall yardstick for the
    approximate paths). For query sets that grow with the corpus use
    :func:`cosine_topk_lsh` (bucketed candidates) or
    :func:`cosine_topk_ivf` (cell-probed) — at 100 TB this entry is only
    usable with |queries| small enough to broadcast and to afford a full
    corpus scan per batch.
    """
    corpus = df.selectExpr(
        id_col, f"{sql_quantize(vec_col)} AS qv"
    ).selectExpr("*", f"{sql_norm_q('qv')} AS norm")
    qs = F.broadcast(
        queries.selectExpr(
            query_id_col, f"{sql_quantize(vec_col)} AS qq"
        ).selectExpr("*", f"{sql_norm_q('qq')} AS qnorm")
    )
    scored = (
        corpus.crossJoin(qs)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            dot_q_vectorized()(F.col("qq"), F.col("qv"))
            / (F.col("qnorm") * F.col("norm")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
        .orderBy(query_id_col, "rank")
    )


def mips_topk_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact max-inner-product top-k per query vector (MIPS — the retrieval
    objective of recommender / dual-encoder models, where magnitude matters
    and cosine's normalization is wrong).

    Scoring is the exact integer dot product on the quantized grid — with
    dim 64 and |q| ≤ QUANT_SCALE the dot stays far below 2^53, so the
    double that carries it is exact and the ranking is deterministic
    (dot desc, id asc). One float step at the end rescales to the original
    units (correctly-rounded division, engine-independent).

    Same CONTRACT as :func:`cosine_topk_bruteforce` — small broadcastable
    query set; cost is corpus × |queries|. For the 100 TB approximate path,
    the standard reduction (append sqrt(M² − ‖x‖²) to corpus vectors and 0
    to queries, M = max corpus norm) turns MIPS into cosine search, making
    :func:`cosine_topk_lsh` / :func:`cosine_topk_ivf` directly reusable.
    """
    corpus = df.selectExpr(id_col, f"{sql_quantize(vec_col)} AS qv")
    qs = F.broadcast(
        queries.selectExpr(query_id_col, f"{sql_quantize(vec_col)} AS qq")
    )
    scored = (
        corpus.crossJoin(qs)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("_dotq", dot_q_vectorized()(F.col("qq"), F.col("qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("_dotq"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            (F.col("_dotq") / F.lit(float(QUANT_SCALE) ** 2)).alias("dot"),
            "rank",
        )
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplane) approximate variant — the 100 TB path
# ---------------------------------------------------------------------------


def hyperplane_signature(
    vec_q: Column | str, dim: int, n_planes: int = 8
) -> Column:
    """Sign-bit signature against ``n_planes`` deterministic pseudo-random
    ±1 hyperplanes (plane p, dim d → sign from the portable md5 hash).

    Plane signs are row-independent constants, so they are computed ONCE in
    Python (hashlib md5 — bit-identical to the engine hash) and embedded as
    array literals; an expression form would re-hash every dim for every
    row. The whole signature is ONE ``F.expr`` over a generated SQL string:
    a Column-API formulation would create n_planes×dim literal Columns and
    per-plane lambdas — thousands of py4j round-trips, seconds of driver
    time per plan build, before Catalyst even sees it. Buckets collide for
    nearby vectors; Hamming-near buckets could be probed for recall — here
    we use exact-bucket candidates (documented recall trade-off).

    ``vec_q``: the quantized-vector column, as a name or SQL expression
    string (a Column is accepted only if it round-trips via its name).
    """
    return F.expr(sql_hyperplane_signature(vec_q, dim, n_planes))


def sql_hyperplane_signature(
    vec_q: Column | str, dim: int, n_planes: int = 8
) -> str:
    """SQL-string form of :func:`hyperplane_signature`."""
    import hashlib

    vec_sql = vec_q if isinstance(vec_q, str) else vec_q._jc.toString()

    def _plane_sql(p: int) -> str:
        signs = [
            (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) & 1) * 2 - 1
            for d in range(dim)
        ]
        return "array(" + ",".join(f"{s}L" for s in signs) + ")"

    bits = [
        f"(CASE WHEN aggregate(zip_with({vec_sql}, {_plane_sql(p)},"
        f" (x, s) -> x * s), 0L, (acc, x) -> acc + x) >= 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    ]
    return " + ".join(bits)


def cosine_topk_lsh(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored. Same output shape as brute force (rank gaps show recall loss).
    """
    corpus = df.selectExpr(id_col, f"{sql_quantize(vec_col)} AS qv").selectExpr(
        "*",
        f"{sql_hyperplane_signature('qv', dim, n_planes)} AS bucket",
        f"{sql_norm_q('qv')} AS norm",
    )
    qs = F.broadcast(
        queries.selectExpr(
            query_id_col, f"{sql_quantize(vec_col)} AS qq"
        ).selectExpr(
            "*",
            f"{sql_hyperplane_signature('qq', dim, n_planes)} AS bucket",
            f"{sql_norm_q('qq')} AS qnorm",
        )
    )
    scored = (
        corpus.join(qs, "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            dot_q_vectorized()(F.col("qq"), F.col("qv"))
            / (F.col("qnorm") * F.col("norm")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# Binary-sketch (packed-bit Hamming) ANN — the memory-bandwidth scale path
# ---------------------------------------------------------------------------

HAMMING_BITS = 60  # 2^p must stay in signed-64 range in BOTH engines
# (Spark long + DuckDB BIGINT) — the SIMHASH_BITS discipline.


def hamming_signature_udf(dim: int, n_bits: int = HAMMING_BITS):
    """GEMM-per-batch pandas_udf computing the packed ``n_bits`` hyperplane
    sign signature of a quantized int64 vector — bit-identical to
    :func:`sql_hyperplane_signature` (same md5-derived ±1 planes, exact
    int64 sums, ``>= 0`` sign, ``2^p`` packing; pytest-pinned equality).

    Why not the SQL expression for the 60-bit sketch (OPTIMIZATION r14,
    guide §4.2): ``aggregate(zip_with(...))`` lambdas are interpreted per
    element — 60 planes × 64 dims ≈ 4k lambda invocations per row (the
    measured signature pass was 0.98 s at sf0.1); inlining the sums as
    explicit arithmetic blows the 64 KB codegen method limit and falls
    back to interpreted (4.2 s). One NumPy int64 GEMM per Arrow batch is
    memory-bandwidth-optimal and measured 0.19 s — 5× faster, and the gap
    widens with corpus size. The few-plane LSH *bucket* variants (4-8
    planes) stay on the SQL expression: their lambda count is small and
    keeping them JVM-side preserves bucket-join pushdown."""
    import hashlib

    import numpy as np

    S = np.array(
        [
            [
                (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) & 1)
                * 2
                - 1
                for d in range(dim)
            ]
            for p in range(n_bits)
        ],
        dtype=np.int64,
    )
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sig(v):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="int64")
        X = np.stack(v.values).astype(np.int64, copy=False)  # n × dim
        bits = (X @ S.T) >= 0  # n × n_bits, exact int64 sums
        return pd.Series(bits @ weights)

    return _sig


def hamming_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = HAMMING_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Binary-sketch ANN: each vector compresses to ``n_bits`` hyperplane
    sign bits packed into ONE long (reusing :func:`hyperplane_signature`'s
    packed-sum form), candidates rank by Hamming distance
    ``bit_count(sig_q ^ sig_c)`` — exact integer math — and only the k
    winners per query get the exact quantized-cosine re-rank.

    Scale posture: the sketch is 8 bytes/vector versus 256 for float32×64 —
    the per-query scan touches ~32× less data than brute-force cosine, the
    distance is one xor+popcount in whole-stage codegen (no arrays, no
    Python), and the sketch column is precomputable/storable so repeated
    query batches never touch the raw vectors until the final re-rank of
    k rows. Query set broadcasts (same small-probe contract as
    :func:`cosine_topk_bruteforce`).

    Output: (query_id, vec_id, hamming, cosine, rank) — rank by Hamming
    asc with vec_id tie-break; cosine is reported for the winners so
    recall against the exact baseline is directly measurable.
    """
    sig_udf = hamming_signature_udf(dim, n_bits)
    corpus = df.selectExpr(
        id_col, f"{sql_quantize(vec_col)} AS qv"
    ).select(id_col, "qv", sig_udf(F.col("qv")).alias("sig"))
    qs = F.broadcast(
        queries.selectExpr(
            query_id_col, f"{sql_quantize(vec_col)} AS qq"
        ).select(
            query_id_col, "qq", sig_udf(F.col("qq")).alias("qsig")
        )
    )
    cand = (
        corpus.crossJoin(qs)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("hamming", F.expr("bit_count(sig ^ qsig)"))
    )
    w = Window.partitionBy(query_id_col).orderBy("hamming", F.asc(id_col))
    topk = cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    # exact re-rank metric for the k winners only: quantized integer dot /
    # norms, all JVM-side (k×|queries| rows — no Arrow batch needed)
    return topk.selectExpr(
        query_id_col,
        id_col,
        "CAST(hamming AS BIGINT) AS hamming",
        f"{sql_dot_q('qq', 'qv')} / ({sql_norm_q('qq')} * {sql_norm_q('qv')})"
        " AS cosine",
        "CAST(rank AS BIGINT) AS rank",
    ).orderBy(query_id_col, "rank")


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact baseline:
    per query, the fraction of the exact top-k the approximate index
    retrieved — the quality yardstick every approximate tier (LSH, IVF,
    IVF-PQ, Hamming) is tuned against. Takes the two top-k result frames
    (any of this module's ``*_topk`` outputs), joins on (query, id) and
    counts hits; queries the approximate side missed entirely still
    appear with recall 0.

    Scale posture: both inputs are top-k results — k·|queries| rows — so
    the join is broadcast-sized regardless of corpus size; measuring
    recall never re-touches the vectors.

    Output: (query_id, hits, recall) ordered by query id.
    """
    a = approx.select(
        F.col(query_id_col), F.col(id_col), F.lit(1).alias("_hit")
    )
    e = exact.select(query_id_col, id_col)
    return (
        e.join(F.broadcast(a), [query_id_col, id_col], "left")
        .groupBy(query_id_col)
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hits"))
        .select(
            query_id_col,
            F.col("hits").cast("long").alias("hits"),
            F.round(F.col("hits") / F.lit(float(k)), 4).alias("recall"),
        )
        .orderBy(query_id_col)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed cell search
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic k-means coarse quantizer: init = the k lowest-id
    vectors, then ``iters`` Lloyd rounds. Assignment is a vectorized
    pandas_udf (one matrix multiply per Arrow batch); the centroid update
    is a distributed groupBy over exploded dimensions. Returns a numpy
    (k, dim) array — centroids are the *index*, tiny by construction, and
    live on the driver/broadcast like any index metadata."""
    import numpy as np

    df = df.select(id_col, vec_col).persist()  # read once per Lloyd round
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = np.array([r[0] for r in init], dtype=np.float64)

    for _ in range(iters):
        assigned = df.select(
            id_col, vec_col, ivf_assign_udf(centroids)(F.col(vec_col)).alias("cell")
        )
        # element-wise mean per cell: explode dims, one hash aggregate
        dims = assigned.select(
            "cell", F.posexplode(vec_col).alias("dim", "x")
        )
        rows = (
            dims.groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("ms"))
            .collect()
        )
        for r in rows:
            centroids[r.cell] = [s.m for s in r.ms]
    df.unpersist()  # the centroids are driver-side numpy; nothing lazy remains
    return centroids


def ivf_train_centroids_local(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Driver-side k-means over a (small, deterministic) training sample —
    same init/update rule as ``ivf_train_centroids`` but pure numpy: a
    training sample is index metadata (KBs), so paying Spark-job round
    trips per Lloyd round is waste. Pass ``df`` already limited to the
    sample size."""
    import numpy as np

    rows = df.orderBy(id_col).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return kmeans_numpy(X, k, iters)


def kmeans_numpy(X, k: int, iters: int):
    """The pure-numpy Lloyd loop shared by the Spark trainer and the oracle
    harness (which must reproduce identical centroids from the same sample):
    init = first k rows, L2 assignment via ||c||² − 2x·c, mean update."""
    centroids = X[:k].copy()
    for _ in range(iters):
        d = (centroids * centroids).sum(axis=1)[None, :] - 2.0 * (X @ centroids.T)
        cells = d.argmin(axis=1)
        for c in range(k):
            members = X[cells == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign_udf(centroids):
    """pandas_udf: embedding → nearest-centroid id (L2). One GEMM per
    Arrow batch — ||x−c||² = ||x||² − 2x·c + ||c||², argmin over cells."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def _assign(v):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(v.values).astype(np.float64)
        d = c_norm2[None, :] - 2.0 * (X @ C.T)  # ||x||² constant per row
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _assign


def _probed_queries(
    queries: DataFrame,
    centroids,
    nprobe: int,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
):
    """Shared query-side prep for every IVF-family search: quantize,
    precompute the norm, probe the ``nprobe`` nearest cells with one GEMM
    pandas_udf (stable argsort tie-break), explode to (query, cell) rows,
    broadcast. Extracted so probe/quantization semantics cannot drift
    between the raw, PQ, and residual-PQ variants."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (C * C).sum(axis=1)
    n_probe = min(nprobe, len(C))

    @pandas_udf("array<int>")
    def _probe(v):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(v.values).astype(np.float64)
        d = c_norm2[None, :] - 2.0 * (X @ C.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.astype("int32")))

    return F.broadcast(
        queries.selectExpr(
            query_id_col, vec_col, f"{sql_quantize(vec_col, scale)} AS qq"
        )
        .selectExpr("*", f"{sql_norm_q('qq')} AS qnorm")
        .withColumn("cells", _probe(F.col(vec_col)))
        .select(query_id_col, "qq", "qnorm", F.explode("cells").alias("cell"))
    )


def index_fingerprint(*arrays, scale: int = QUANT_SCALE) -> str:
    """Deterministic fingerprint of an index's training inputs (centroid
    / codebook arrays + quantization scale). Stamped onto corpus index
    frames so a consumer given a prebuilt corpus can ASSERT it was
    encoded with the same quantizer instead of silently producing
    plausible-but-wrong results (ADVICE r14 #4)."""
    import hashlib

    import numpy as np

    h = hashlib.md5()
    for a in arrays:
        h.update(
            np.ascontiguousarray(np.asarray(a, dtype=np.float64)).tobytes()
        )
    h.update(str(int(scale)).encode())
    return h.hexdigest()


def _stamp_cell(df: DataFrame, fp: str) -> DataFrame:
    """Carry the quantizer fingerprint in the ``cell`` column's metadata —
    part of the schema, so it survives localCheckpoint round trips."""
    return df.withColumn(
        "cell", F.col("cell").alias("cell", metadata={"index_fingerprint": fp})
    )


def _assert_corpus_stamp(corpus: DataFrame, fp: str, caller: str) -> None:
    """Mismatch ⇒ ValueError; an UNstamped frame (built outside the
    corpus builders) passes — provenance unknown is the caller's risk,
    provenance KNOWN-wrong is an error."""
    try:
        got = corpus.schema["cell"].metadata.get("index_fingerprint")
    except (KeyError, AttributeError):
        got = None
    if got is not None and got != fp:
        raise ValueError(
            f"{caller}: the prebuilt corpus index was encoded with a "
            "different quantizer (centroids/codebooks/scale fingerprint "
            f"{got} != {fp}) — rebuild it with these training inputs"
        )


def ivf_corpus(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF-flat inverted-list records — (id, qv, norm, cell): each
    corpus vector quantized, its norm precomputed, assigned to its
    nearest-centroid cell (one GEMM pandas_udf pass). This frame IS the
    index a real IVF deployment stores (FAISS IndexIVFFlat keeps exactly
    the vectors grouped by cell); extracted so consumers can build it
    once per dataset instead of re-encoding the corpus per query. The
    ``cell`` column carries the quantizer fingerprint (ADVICE r14 #4)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    return _stamp_cell(
        df.selectExpr(id_col, vec_col, f"{sql_quantize(vec_col)} AS qv")
        .selectExpr("*", f"{sql_norm_q('qv')} AS norm")
        .withColumn("cell", ivf_assign_udf(C)(F.col(vec_col)))
        .drop(vec_col),
        index_fingerprint(C),
    )


def cosine_topk_ivf(
    df: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF search: corpus vectors live in their nearest-centroid cell;
    each query probes its ``nprobe`` nearest cells and scores only those
    vectors. Join shuffles on the cell id — cost ≈ corpus·(nprobe/k) —
    the 100 TB path when LSH bucket skew bites. ``corpus`` accepts a
    prebuilt :func:`ivf_corpus` frame (the stored index) so repeated
    searches skip the encode pass."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    if corpus is None:
        corpus = ivf_corpus(df, centroids, id_col, vec_col)
    else:
        _assert_corpus_stamp(corpus, index_fingerprint(C), "cosine_topk_ivf")
    qs = _probed_queries(queries, C, nprobe, query_id_col, vec_col)
    scored = (
        corpus.join(qs, "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            dot_q_vectorized()(F.col("qq"), F.col("qv"))
            / (F.col("qnorm") * F.col("norm")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
        .orderBy(query_id_col, "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold), candidates restricted to same-LSH-bucket vectors.

    Work is bucketed — Σ bucket² pair scores instead of corpus² — the
    100 TB path. Fewer planes ⇒ bigger buckets ⇒ higher recall and higher
    cost (documented approximate-recall trade-off; an exact variant is
    the brute-force cross join).

    Scoring shape (OPTIMIZATION r14, guide §8 "move heavy bytes once"):
    ONE groupBy(bucket) + applyInPandas GEMM per bucket, replacing the
    bucket self-join + per-pair-instance pandas scoring — which shuffled
    and Arrow-shipped BOTH quantized vectors per candidate pair
    (Σ bucket² · dim longs; 2000 vectors at sf0.1 ≈ 250k instances ≈
    256 MB through the Python boundary). Now each vector crosses the
    shuffle and the boundary ONCE (Σ bucket · dim).

    Memory bound (OPTIMIZATION r15, VERDICT r14 item 3 / ADVICE r14 #1,
    guide §5): the Gram matrix is computed in ROW BLOCKS
    (:func:`_blocked_cosine_pairs`) so a skewed bucket costs
    O(block · bucket) task memory instead of O(bucket²) — a 10⁵-row hot
    bucket peaks around the block budget (~64 MB per intermediate)
    rather than the 80 GB an n×n float64 matrix plus triu index arrays
    would need. Σ bucket² compute is intrinsic to exact verification;
    only the MEMORY was quadratic. Bit-identical: each block is the same
    exact int64 ``M[i0:i1] @ M.T`` and the same
    ``dot / (norm_a · norm_b)`` float chain, emitted in the same
    row-major pair order (tests/test_r14_equivalence.py and
    tests/test_r15_equivalence.py pin it)."""
    import pandas as pd

    c = df.selectExpr(id_col, f"{sql_quantize(vec_col)} AS qv").selectExpr(
        "*", f"{sql_hyperplane_signature('qv', dim, n_planes)} AS bucket"
    )
    thr = float(threshold)
    idc = id_col
    # ADVICE r14 #3: the output id type follows the input id column
    # instead of hard-coding long (string doc ids used to fail at Arrow
    # conversion)
    id_type = df.schema[id_col].dataType.simpleString()

    def _pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids, M = _sorted_bucket_matrix(pdf, idc)
        if M is None:
            # ids[:0] keeps the input id dtype for the Arrow conversion
            return pd.DataFrame(
                {
                    "id_a": ids[:0],
                    "id_b": ids[:0],
                    "cosine": np.array([], dtype="float64"),
                }
            )
        ia, ib, cos = _blocked_cosine_pairs(M, thr)
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine": cos}
        )

    return c.groupBy("bucket").applyInPandas(
        _pairs, f"id_a {id_type}, id_b {id_type}, cosine double"
    )


# Row-block budget for the per-bucket Gram matrices: each int64/float64
# intermediate is capped near 64 MB, so per-task peak is O(block·n), not
# O(n²) (guide §5; VERDICT r14 item 3). Module-level so tests can shrink
# it to force multi-block execution on small fixtures.
GRAM_BLOCK_BYTES = 64 << 20


def _gram_block_rows(n: int, block_bytes: int | None = None) -> int:
    """Rows per Gram block: block·n·8 bytes ≈ the budget, ≥1, ≤n."""
    b = int((block_bytes or GRAM_BLOCK_BYTES) // max(n * 8, 1))
    return max(1, min(b, n))


def _sorted_bucket_matrix(pdf, id_col: str):
    """(ids sorted ascending, int64 matrix in that order) for one bucket
    group; (ids, None) when the group is too small to pair."""
    import numpy as np

    n = len(pdf)
    ids = pdf[id_col].to_numpy()
    if n < 2:
        return ids, None
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack(pdf["qv"].to_numpy()[order]).astype(np.int64, copy=False)
    return ids, M


def _blocked_cosine_pairs(M, thr: float, block_bytes: int | None = None):
    """Upper-triangle cosine pairs of the quantized row matrix ``M`` with
    cosine ≥ ``thr``, computed in row blocks: returns (i_idx, j_idx, cos)
    with i < j, in row-major pair order — exactly the order and float
    values of the full-matrix ``triu_indices`` formulation it replaced,
    with per-call peak memory O(block · n) instead of O(n²)."""
    import numpy as np

    n = M.shape[0]
    # exact int64 row norms == the full Gram's diagonal
    d = np.einsum("ij,ij->i", M, M)
    dn = np.sqrt(d.astype(np.float64))  # = sql_norm_q
    block = _gram_block_rows(n, block_bytes)
    out_i, out_j, out_c = [], [], []
    for i0 in range(0, n - 1, block):
        i1 = min(i0 + block, n)
        G = M[i0:i1] @ M.T  # exact int64: |q| ≤ 1e6·dim ⇒ |dot| ≪ 2^63
        # same float chain as the relational form: dot / (norm_a * norm_b)
        C = G.astype(np.float64) / (dn[i0:i1, None] * dn[None, :])
        mask = C >= thr
        # upper triangle only: global j > global i
        mask &= np.arange(n)[None, :] > np.arange(i0, i1)[:, None]
        bi, bj = np.nonzero(mask)  # row-major, matching triu_indices order
        if bi.size:
            out_i.append(bi + i0)
            out_j.append(bj)
            out_c.append(C[bi, bj])
    if not out_i:
        z = np.array([], dtype="int64")
        return z, z, np.array([], dtype="float64")
    return (
        np.concatenate(out_i),
        np.concatenate(out_j),
        np.concatenate(out_c),
    )


def centroid_by_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    flat: bool = False,
) -> DataFrame:
    """Per-label mean embedding (class centroids — the building block for
    nearest-centroid classification, cluster summaries, and IVF cell
    retraining).

    Float vector sums are accumulation-order-dependent, so the mean runs on
    the quantized integer grid: posexplode → exact int64 sum per (label,
    dim) → one float division per dim — bit-deterministic and
    oracle-checkable, same discipline as the cosine operators. Reassembly
    sorts (dim, value) structs, so the output array order is exact. Two
    map-side-combinable shuffles on (label, dim) then (label); at 1B
    vectors the (label, dim) partial aggregate is the only wide stage.

    ``flat=True`` skips reassembly and returns one row per
    ``(label, pos, value, n_vectors)`` — a list-free schema downstream
    tooling (and the driver's pandas canonicalizer) can sort/hash, and one
    fewer shuffle.
    """
    q = df.select(
        F.col(label_col),
        F.posexplode(quantize(vec_col, scale)).alias("_pos", "_qv"),
    )
    agg = q.groupBy(label_col, "_pos").agg(
        F.sum("_qv").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    per_dim = agg.withColumn(
        "_v",
        F.col("_s").cast("double") / (F.col("_n") * F.lit(float(scale))),
    )
    if flat:
        return per_dim.select(
            F.col(label_col),
            F.col("_pos").cast("long").alias("pos"),
            F.col("_v").alias("value"),
            F.col("_n").alias("n_vectors"),
        ).orderBy(label_col, "pos")
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("_pos", "_v"))).alias("_pairs"),
            F.max("_n").alias("n_vectors"),
        )
        .select(
            label_col,
            F.transform(F.col("_pairs"), lambda p: p["_v"]).alias("centroid"),
            "n_vectors",
        )
        .orderBy(label_col)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the memory-scale path on top of IVF)
# ---------------------------------------------------------------------------
#
# Classic IVFADC shape (Jégou et al. 2011, public): a coarse IVF quantizer
# routes vectors to cells; inside, each vector is stored as m sub-space
# CODES (one per dim/m-slice, each the id of the nearest sub-codebook
# centroid) — m small ints instead of dim floats, the representation that
# makes a 100 TB corpus fit an index. Scoring is ADC: the query stays
# full-precision and the corpus side is looked up from the codebooks. This
# variant encodes raw vectors (no residual subtraction — documented
# simplification; residual PQ plugs into the same plumbing) and runs ADC on
# the QUANTIZED integer grid so candidate scores are exact integers (same
# cross-engine determinism discipline as every other similarity operator
# here: one float division at the end).


def pq_train_codebooks_local(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 1000,
):
    """Per-subspace k-means codebooks from a deterministic pinned sample
    (first ``sample`` vectors by id) — index metadata, trained driver-side
    like ``ivf_train_centroids_local``. Returns numpy (m, ks, dim/m)."""
    import numpy as np

    rows = df.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            kmeans_numpy(X[:, s * dsub : (s + 1) * dsub].copy(), ks, iters)
            for s in range(m)
        ]
    )


def pq_encode_udf(codebooks):
    """pandas_udf: embedding → array of m sub-space codes (argmin L2 per
    subspace, one GEMM per subspace per Arrow batch — same float-distance
    rule the oracle replays in SQL)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    CB = np.asarray(codebooks, dtype=np.float64)  # (m, ks, dsub)
    m, ks, dsub = CB.shape
    cn2 = (CB * CB).sum(axis=2)  # (m, ks)

    @pandas_udf("array<int>")
    def _encode(v):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(v.values).astype(np.float64)  # (n, dim)
        codes = np.empty((X.shape[0], m), dtype="int32")
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            d = cn2[s][None, :] - 2.0 * (Xs @ CB[s].T)
            codes[:, s] = d.argmin(axis=1).astype("int32")
        return pd.Series(list(codes))

    return _encode


def _pq_quantized(codebooks, scale: int = QUANT_SCALE):
    """Codebooks on the integer grid + per-code quantized norms²."""
    import numpy as np

    CB = np.asarray(codebooks, dtype=np.float64)
    CBq = np.round(CB * scale).astype(np.int64)
    CBn2 = (CBq.astype(object) ** 2).sum(axis=2).astype(np.int64)
    return CBq, CBn2


def _sql_array_literal_3d(A) -> str:
    return (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{int(v)}L" for v in code) + ")"
                for code in sub
            )
            + ")"
            for sub in A
        )
        + ")"
    )


def _sql_array_literal_2d(A) -> str:
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{int(v)}L" for v in row) + ")" for row in A
        )
        + ")"
    )


def ivfpq_corpus(
    df: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """The IVF-PQ index records — (id, cell, codes, vnorm2q): coarse cell
    + m sub-quantizer codes + the quantized reconstruction norm². The
    compressed representation a PQ deployment stores (FAISS IndexIVFPQ);
    extracted like :func:`ivf_corpus` so consumers encode the corpus once
    per dataset."""
    import numpy as np

    CB = np.asarray(codebooks, dtype=np.float64)
    m = CB.shape[0]
    _, CBn2 = _pq_quantized(CB, scale)
    cbn_lit = _sql_array_literal_2d(CBn2)
    return _stamp_cell(
        df.select(id_col, vec_col)
        .withColumn("cell", ivf_assign_udf(np.asarray(centroids))(F.col(vec_col)))
        .withColumn("codes", pq_encode_udf(CB)(F.col(vec_col)))
        .drop(vec_col)
        .selectExpr(
            id_col,
            "cell",
            "codes",
            # vnorm²q from the codebook norms — part of the index record
            f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, s) ->"
            f" acc + element_at(element_at({cbn_lit}, s + 1),"
            f" element_at(codes, s + 1) + 1)) AS vnorm2q",
        ),
        index_fingerprint(centroids, CB, scale=scale),
    )


def cosine_topk_ivfpq(
    df: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = QUANT_SCALE,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN search: corpus = (cell, m codes, quantized norm²) — the
    compressed index representation; queries stay full-precision
    (quantized ints), probe ``nprobe`` cells, and score by ADC lookup: an
    exact-integer dot between the query slice and the coded sub-centroid,
    summed over subspaces with an inlined codebook literal — pure JVM
    expressions after the one encode pass, one float division at the end.
    Join shuffles on cell id like plain IVF; per-pair work is O(dim) int
    multiplies with no corpus-vector bytes moving through the shuffle."""
    import numpy as np

    CB = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = CB.shape
    CBq, CBn2 = _pq_quantized(CB, scale)
    cbq_lit = _sql_array_literal_3d(CBq)

    if corpus is None:
        corpus = ivfpq_corpus(
            df, centroids, codebooks, id_col, vec_col, scale
        )
    else:
        # ADVICE r14 #4: a corpus encoded with different centroids /
        # codebooks / scale would yield plausible but wrong ADC scores
        _assert_corpus_stamp(
            corpus,
            index_fingerprint(centroids, CB, scale=scale),
            "cosine_topk_ivfpq",
        )

    qs = _probed_queries(
        queries, centroids, nprobe, query_id_col, vec_col, scale
    )
    adc = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, s) ->"
        f" acc + aggregate(sequence(1, {dsub}), CAST(0 AS BIGINT), (a, d) ->"
        f" a + element_at(qq, s * {dsub} + d)"
        f" * element_at(element_at(element_at({cbq_lit}, s + 1),"
        f" element_at(codes, s + 1) + 1), d)))"
    )
    scored = (
        corpus.join(qs, "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .selectExpr(
            query_id_col,
            id_col,
            f"CAST({adc} AS DOUBLE)"
            f" / (qnorm * sqrt(CAST(vnorm2q AS DOUBLE))) AS adc_cosine",
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc_cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_cosine", "rank")
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (classic IVFADC: PQ over coarse-quantization residuals)
# ---------------------------------------------------------------------------


def pq_train_residual_codebooks_local(
    df: DataFrame,
    centroids,
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 1000,
):
    """Per-subspace codebooks trained on COARSE RESIDUALS (v − c_cell) —
    the classic IVFADC recipe: residuals are much smaller than raw vectors,
    so the same code budget quantizes far more precisely. Deterministic:
    sample → numpy cell assignment → per-subspace kmeans, all with the
    shared routines the oracle harness replays."""
    import numpy as np

    rows = df.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    if X.shape[1] % m:
        # same contract as pq_train_codebooks_local: silent truncation of
        # trailing dims would desync the coarse term from the codes
        raise ValueError(f"dim {X.shape[1]} not divisible by m={m}")
    C = np.asarray(centroids, dtype=np.float64)
    d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
    cells = d.argmin(axis=1)
    R = X - C[cells]
    dim = X.shape[1]
    dsub = dim // m
    return np.stack(
        [
            kmeans_numpy(R[:, s * dsub : (s + 1) * dsub].copy(), ks, iters)
            for s in range(m)
        ]
    )


def pq_encode_residual_udf(codebooks, centroids, scale: int = QUANT_SCALE):
    """pandas_udf over (embedding, cell): residual r = v − c_cell, argmin
    L2 per subspace over the residual codebooks, PLUS the exact quantized
    norm² of the reconstruction (Cq[cell] + CBq[codes]) — returned as
    array<long> [code_0..code_{m-1}, vnorm2q] (one index record)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    CB = np.asarray(codebooks, dtype=np.float64)  # (m, ks, dsub)
    m, ks, dsub = CB.shape
    cn2 = (CB * CB).sum(axis=2)
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    CBq = np.round(CB * scale).astype(np.int64)
    Cq = np.round(C * scale).astype(np.int64)

    @pandas_udf("array<long>")
    def _encode(v, cell):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(v.values).astype(np.float64)
        cells = cell.values.astype("int64")
        R = X - C[cells]
        codes = np.empty((X.shape[0], m), dtype=np.int64)
        recon_q = Cq[cells].copy()  # (n, dim) int64
        for s in range(m):
            Rs = R[:, s * dsub : (s + 1) * dsub]
            d = cn2[s][None, :] - 2.0 * (Rs @ CB[s].T)
            cs = d.argmin(axis=1)
            codes[:, s] = cs
            recon_q[:, s * dsub : (s + 1) * dsub] += CBq[s][cs]
        vnorm2q = np.einsum("ij,ij->i", recon_q, recon_q)
        out = np.concatenate([codes, vnorm2q[:, None]], axis=1)
        return pd.Series(list(out))

    return _encode


def cosine_topk_ivfpq_residual(
    df: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Residual IVF-PQ search: corpus index = (cell, m residual codes,
    quantized reconstruction norm²); ADC score = qq·Cq[cell] (the coarse
    term) + Σ_s qq_s·CBq[s][code_s] (the residual lookups) — exact
    integers with the centroid and codebook tables inlined as JVM literals,
    one float division at the end. Same shuffle shape as raw-vector PQ."""
    import numpy as np

    CB = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = CB.shape
    C = np.asarray(centroids, dtype=np.float64)
    CBq = np.round(CB * scale).astype(np.int64)
    Cq = np.round(C * scale).astype(np.int64)
    cbq_lit = _sql_array_literal_3d(CBq)
    cq_lit = _sql_array_literal_2d(Cq)

    corpus = (
        df.select(id_col, vec_col)
        .withColumn("cell", ivf_assign_udf(C)(F.col(vec_col)))
        .withColumn(
            "rec", pq_encode_residual_udf(CB, C, scale)(F.col(vec_col), F.col("cell"))
        )
        .drop(vec_col)
        .selectExpr(
            id_col,
            "cell",
            f"slice(rec, 1, {m}) AS codes",
            f"element_at(rec, {m + 1}) AS vnorm2q",
        )
    )

    qs = _probed_queries(queries, C, nprobe, query_id_col, vec_col, scale)
    coarse = (
        f"aggregate(sequence(1, {C.shape[1]}), CAST(0 AS BIGINT), (a, d) ->"
        f" a + element_at(qq, d)"
        f" * element_at(element_at({cq_lit}, cell + 1), d))"
    )
    resid = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, s) ->"
        f" acc + aggregate(sequence(1, {dsub}), CAST(0 AS BIGINT), (a, d) ->"
        f" a + element_at(qq, s * {dsub} + d)"
        f" * element_at(element_at(element_at({cbq_lit}, s + 1),"
        f" CAST(element_at(codes, s + 1) AS INT) + 1), d)))"
    )
    scored = (
        corpus.join(qs, "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .selectExpr(
            query_id_col,
            id_col,
            f"CAST(({coarse}) + ({resid}) AS DOUBLE)"
            f" / (qnorm * sqrt(CAST(vnorm2q AS DOUBLE))) AS adc_cosine",
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc_cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_cosine", "rank")
        .orderBy(query_id_col, "rank")
    )


def semdedup(
    df: DataFrame,
    centroids,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering — assign every vector to its nearest
    k-means centroid, then inside each cluster flag any vector whose
    cosine to a LOWER-id cluster-mate clears the threshold
    (keep-lowest-id, the deterministic stand-in for the paper's
    keep-farthest-from-centroid tie-break).

    Output: one row per vector — (id, cell, is_dup 0/1). Survivors are
    the is_dup = 0 rows; the flag form keeps the operator composable
    (filter vs audit) without re-scoring.

    Scale: the paper's whole point is that clustering bounds the
    quadratic term — work is Σ cell² ≈ N²/k pair scores, and k grows
    with the corpus (√N keeps per-cell work flat). Assignment is one
    GEMM pandas_udf pass; cosines run on the exact integer-quantized
    grid (one deterministic float division at the end) like every
    similarity operator here.

    Scoring shape (OPTIMIZATION r14 — the ``cosine_near_dup_pairs``
    restructure): ONE groupBy(cell) + applyInPandas GEMM per cell
    replaces the cell self-join → per-pair-instance scoring → distinct →
    flag join-back. Each vector crosses the shuffle and the Arrow
    boundary once (Σ cell · dim instead of Σ cell² · dim) and the flag
    ``any lower-id mate ≥ threshold`` is a triangular reduction of the
    cell's exact int64 Gram matrix, computed in ROW BLOCKS
    (:func:`_blocked_dup_flags`) so a hot cell costs O(block · cell)
    task memory, not O(cell²) (OPTIMIZATION r15, VERDICT r14 item 3 /
    ADVICE r14 #1). Bit-identical flags (same quantized dot, same float
    chain; tests/test_r14_equivalence.py, tests/test_r15_equivalence.py).

    ``corpus`` accepts a prebuilt (already materialized)
    :func:`ivf_corpus` frame — the SAME index records the IVF search
    tier stores — so a session that has built the index does not
    re-encode the corpus. The frame must have been encoded with THESE
    ``centroids`` at this module's quantization scale: per ADVICE r14
    #4, :func:`ivf_corpus` stamps the frame with a fingerprint of its
    training inputs and ``semdedup`` asserts the stamp matches instead
    of silently trusting the caller."""
    import numpy as np
    import pandas as pd

    if corpus is None:
        c = ivf_corpus(df, centroids, id_col, vec_col)
    else:
        c = corpus
        _assert_corpus_stamp(c, index_fingerprint(centroids), "semdedup")
    thr = float(threshold)
    idc = id_col
    id_type = (
        df.schema[id_col].dataType.simpleString()
        if id_col in df.columns
        else c.schema[id_col].dataType.simpleString()
    )

    def _flags(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids, M = _sorted_bucket_matrix(pdf, idc)
        cell = int(pdf["cell"].iat[0])
        n = len(ids)  # M is None ⇔ n == 1 (already trivially sorted)
        dup = (
            np.zeros(n, dtype="int64")
            if M is None
            else _blocked_dup_flags(M, thr)
        )
        return pd.DataFrame(
            {
                idc: ids,
                "cell": np.full(n, cell, dtype="int64"),
                "is_dup": dup,
            }
        )

    return c.groupBy("cell").applyInPandas(
        _flags, f"{id_col} {id_type}, cell long, is_dup long"
    )


def _blocked_dup_flags(M, thr: float, block_bytes: int | None = None):
    """SemDeDup flag vector: dup[i] ⇔ ∃ j < i with cosine(i, j) ≥ thr,
    over the quantized row matrix ``M`` (rows already in ascending-id
    order). Row-blocked Gram — same exact int64 dots and float chain as
    the full ``np.tril(C >= thr, -1).any(axis=1)`` form it replaces, with
    O(block · n) peak memory."""
    import numpy as np

    n = M.shape[0]
    d = np.einsum("ij,ij->i", M, M)
    dn = np.sqrt(d.astype(np.float64))  # = sql_norm_q
    block = _gram_block_rows(n, block_bytes)
    dup = np.zeros(n, dtype="int64")
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        G = M[i0:i1] @ M.T  # exact int64
        # same float chain as the relational form: dot / (na * nb)
        C = G.astype(np.float64) / (dn[i0:i1, None] * dn[None, :])
        mask = C >= thr
        # strictly-lower triangle: global j < global i
        mask &= np.arange(n)[None, :] < np.arange(i0, i1)[:, None]
        dup[i0:i1] = mask.any(axis=1).astype("int64")
    return dup


def jl_sign_matrix(out_dim: int, in_dim: int, seed: str = "jl"):
    """Deterministic ±1 projection matrix from md5 bits (Achlioptas 2003:
    Rademacher entries satisfy the Johnson-Lindenstrauss lemma). A pure
    function of (seed, shape) — both the Spark expression and the DuckDB
    oracle inline the same literal, like the IVF centroids."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16)
            % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    seed: str = "jl",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL random projection: embedding → ``out_dim`` integer coordinates,
    each an EXACT int64 dot product of the quantized vector with a ±1 row
    of the deterministic sign matrix. The standard dim-reduction pass in
    front of ANN indexing (distances preserved within 1±ε w.h.p.); one
    Arrow-batched GEMM per partition — no shuffle; the matrix ships
    inside the udf closure (broadcast-sized by construction)."""
    R = jl_sign_matrix(out_dim, in_dim, seed)
    q = quantize(F.col(vec_col))
    return df.select(
        F.col(id_col), _int_matmul_udf(R)(q).alias("proj")
    )


def pca_train_components_local(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
):
    """Driver-side PCA on a deterministic sample (pass ``df`` already
    limited): mean-center, eigendecompose the covariance, keep the top-k
    components with a fixed sign convention (largest-|entry| coordinate
    made positive — eigenvectors are sign-ambiguous). Like the k-means
    quantizer, training cost is bounded by the sample; the model is index
    metadata. Returns (q_mean, q_components) QUANTIZED to the integer
    grid so projection is exact int64 arithmetic everywhere."""
    import numpy as np

    rows = df.orderBy(id_col).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = np.cov((X - mean).T)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order].T  # (k, dim)
    for j in range(W.shape[0]):
        i = int(np.abs(W[j]).argmax())
        if W[j, i] < 0:
            W[j] = -W[j]
    q_mean = [int(round(v * scale)) for v in mean]
    q_comp = [[int(round(v * scale)) for v in row] for row in W]
    return q_mean, q_comp


def pca_project(
    df: DataFrame,
    q_mean,
    q_components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto the trained components: per output dim an
    EXACT int64 dot product of the mean-centered quantized vector with
    the quantized component row (|q| ≤ 10⁶ each, 64 terms → ≪ 2^63).
    One Arrow GEMM per partition, zero shuffle."""
    q = quantize(F.col(vec_col))
    return df.select(
        F.col(id_col),
        _int_matmul_udf(q_components, center=q_mean)(q).alias("proj"),
    )


def _int_matmul_udf(rows, center=None):
    """pandas_udf: quantized vector → int64 projection via ONE numpy GEMM
    per Arrow batch (optionally mean-centering first). Exact: all operands
    int64, |Σ| ≪ 2^63 — bit-identical to the interpreted ``dot_q`` chain
    it replaces, ~50x faster (the higher-order aggregate() lambda costs
    µs per element; the GEMM amortizes to ns)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    Rt = np.asarray(rows, dtype=np.int64).T  # (in_dim, out_dim)
    c = None if center is None else np.asarray(center, dtype=np.int64)

    @pandas_udf("array<long>")
    def _proj(v):
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(v.values).astype(np.int64, copy=False)
        if c is not None:
            X = X - c
        return pd.Series(list(X @ Rt))

    return _proj


def mmr_rerank(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal Marginal Relevance diversified re-rank (Carbonell &
    Goldstein 1998): greedily select ``k`` of the top-``n_candidates``
    exact-cosine hits, each step maximizing
    ``lam·sim(q,i) − mu·max_{j∈S} sim(i,j)`` (ties → smaller id; step 1
    has no redundancy term, so it is the relevance argmax). The standard
    diversity pass a retrieval pipeline runs between ANN search and
    prompt assembly.

    Scale shape: candidate generation is the brute top-N (same
    small-query-set CONTRACT as :func:`cosine_topk_bruteforce`; swap the
    LSH/IVF path in for corpus-scale query sets); the candidate id set
    broadcasts back onto the corpus scan to fetch vectors (map-side
    hash join, no corpus shuffle), and the greedy loop touches only
    ``n_candidates`` rows per query inside one applyInPandas —
    O(k·n²) int64 dots at n ≤ 20, never driver-side.

    Determinism: pairwise sims are the exact int64 quantized dot with ONE
    float chain ``dot/(√dd_i·√dd_j)`` (identical to the relational
    cosine), and ``lam``/``mu`` are independent literals — never derived
    as ``1−lam``, which is not exactly 0.3 in binary — so the score is
    the same two-mult-one-sub double chain the SQL oracle runs.
    """
    cand = cosine_topk_bruteforce(
        df,
        queries,
        k=n_candidates,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )
    vecs = df.selectExpr(id_col, f"{sql_quantize(vec_col)} AS _qv")
    joined = vecs.join(F.broadcast(cand), id_col).select(
        query_id_col, id_col, "cosine", "_qv"
    )
    out_schema = (
        f"{query_id_col} long, {id_col} long, cosine double, "
        "mmr_score double, mmr_rank int"
    )

    def _greedy(pdf):
        import numpy as np
        import pandas as pd

        qid = int(pdf[query_id_col].iat[0])
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # row order must not matter
        ids = ids[order]
        rel = pdf["cosine"].to_numpy()[order]
        M = np.stack(pdf["_qv"].to_numpy()[order]).astype(np.int64, copy=False)
        G = M @ M.T  # exact: |q| ≤ 1e6, dim 64 ⇒ entries ≪ 2^63
        dn = np.sqrt(G.diagonal().astype(np.float64))
        selected: list[int] = []
        remaining = list(range(len(ids)))
        rows = []
        for step in range(1, min(k, len(ids)) + 1):
            best_t, best_key = None, None
            for t in remaining:
                if selected:
                    ms = max(
                        float(G[t, s]) / (dn[t] * dn[s]) for s in selected
                    )
                    score = lam * rel[t] - mu * ms
                else:
                    score = lam * rel[t]
                key = (-score, ids[t])
                if best_key is None or key < best_key:
                    best_t, best_key = t, key
            selected.append(best_t)
            remaining.remove(best_t)
            rows.append(
                (qid, int(ids[best_t]), float(rel[best_t]),
                 float(-best_key[0]), step)
            )
        return pd.DataFrame(
            rows,
            columns=[query_id_col, id_col, "cosine", "mmr_score", "mmr_rank"],
        )

    return (
        joined.groupBy(query_id_col)
        .applyInPandas(_greedy, out_schema)
        .orderBy(query_id_col, "mmr_rank")
    )
