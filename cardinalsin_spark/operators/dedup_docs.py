"""Document deduplication for LLM training corpora: exact (hash), MinHash+LSH
near-dup, SimHash, and n-gram Jaccard verification (beyond the reference's
surface — BASELINE.json north star).

Design for 100 TB:
- All hashing is built-in (md5 + higher-order array functions) — JVM-side,
  no Python UDFs, so signature computation is a pure map stage.
- LSH turns the quadratic all-pairs problem into groupBy(band_hash) buckets:
  one shuffle on the band keys; only same-bucket docs become candidate
  pairs, and exact Jaccard runs only on candidates.
- The portable hash is H(seed, s) = int64 of the first 15 hex chars of
  md5(seed||':'||s) — deterministic and reproducible in any engine (the
  DuckDB oracle computes the identical value), unlike engine-internal
  murmur3 variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cardinalsin_spark.operators.text import fingerprint, normalize_text, tokens_expr

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4
# char-4 shingles of same-language prose share ~0.33 Jaccard *between random
# docs* — LSH can't separate that from real near-dups. k=8 drops the baseline
# to ~0.1 while true near-dups stay >0.9 (measured on the documents fixture).
DEFAULT_SHINGLE_K = 8


def portable_hash(seed: int | Column, s: Column) -> Column:
    """60-bit integer hash from md5 — identical in Spark and DuckDB."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.conv(
        F.substring(F.md5(F.concat(seed_col, F.lit(":"), s)), 1, 15), 16, 10
    ).cast("long")


# Same prime Spark MLlib's MinHashLSH uses (< 2^31, so i*h2 + h1 stays far
# inside int64 and both engines compute it exactly).
MINHASH_PRIME = 2038074743


def km_hash_pair(md5_col: Column) -> tuple[Column, Column]:
    """2-universal base pair from ONE md5: h1 ∈ [0,p), h2 ∈ [1,p) from the
    two 56-bit halves of the digest. Family i is ``(h1 + i*h2) mod p`` —
    for i≠j the map (h1,h2) → (s_i, s_j) is a bijection mod the prime, so
    families are pairwise independent (the plain Kirsch–Mitzenmacher form
    without the modulus correlates argmins: one small-(h1,h2) shingle wins
    every family and LSH candidate pairs explode). One md5 per shingle
    instead of one per family is what makes signature computation a cheap
    map stage — the md5 dominates; per-family work is an integer FMA+mod."""
    p = F.lit(MINHASH_PRIME)
    h1 = F.conv(F.substring(md5_col, 1, 14), 16, 10).cast("long") % p
    h2 = F.conv(F.substring(md5_col, 15, 14), 16, 10).cast("long") % (p - 1) + 1
    return h1, h2


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id document per normalized-content fingerprint.

    Hash-groupBy (one shuffle on the 128-bit fingerprint); deterministic
    winner. Returns (id, fingerprint, group_size).
    """
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, F.col("fp").alias("fingerprint"), "dup_count")
    )


# ---------------------------------------------------------------------------
# Shingles and MinHash
# ---------------------------------------------------------------------------


def char_shingles(text: Column | str, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Character k-shingles of the normalized text (multiset, in order)."""
    t = normalize_text(text)
    n = F.length(t)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)),
    )


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """Word n-grams of the lowercased token stream."""
    toks = tokens_expr(normalize_text(text))
    cnt = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def exploded_word_ngrams(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sh) rows of word n-grams — same Generate-barrier formulation as
    ``exploded_shingles`` (tokenize once per doc, slice per row)."""
    cnt = F.size(F.col("_toks"))
    return (
        df.select(
            F.col(id_col), F.split(normalize_text(text_col), " ").alias("_toks")
        )
        .select(
            id_col,
            "_toks",
            F.explode(
                F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1)))
            ).alias("_i"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_i"), n)).alias("sh"),
        )
    )


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """(id, sh) rows — one per shingle *position* (multiset; ``.distinct()``
    for set semantics).

    Deliberately NOT ``explode(char_shingles(...))``: a lambda body inside a
    higher-order function is interpreted per element with no subexpression
    caching, so the normalize-regexp would run once per shingle. Projecting
    the normalized text first and exploding a position sequence puts a
    Generate barrier in the plan: the regexp runs once per document and the
    per-row substring is whole-stage-codegen'd. ~7× faster on measured data.
    """
    # The shingle-hash stage is CPU-bound (k md5s per shingle). A small
    # parquet input arrives as 1-2 partitions, serializing it on one core;
    # widen to the cluster's parallelism. (At scale inputs already have
    # plenty of partitions and this is a no-op.)
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    n = F.length(F.col("_norm"))
    return (
        df.select(F.col(id_col), normalize_text(text_col).alias("_norm"))
        .select(
            id_col,
            "_norm",
            F.explode(
                F.sequence(F.lit(1), F.greatest(n - F.lit(shingle_k - 1), F.lit(1)))
            ).alias("_i"),
        )
        .select(
            id_col, F.col("_norm").substr(F.col("_i"), F.lit(shingle_k)).alias("sh")
        )
    )


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """(id, s0..s{n-1}) MinHash signatures via the exploded formulation:
    one row per distinct shingle, then a hash aggregate with ``num_hashes``
    ``min()`` columns.

    This beats an array-column formulation (nested ``F.transform`` per hash
    family) at every scale: the aggregate is map-side combinable,
    whole-stage-codegen'd, and the shingle expression is evaluated once per
    row instead of being inlined into every hash family's expression tree
    (which costs minutes even on tiny data).

    Hash families are 2-universal from ONE md5 per shingle: (h1, h2) base
    pair, family i = (h1 + i*h2) mod p (:func:`km_hash_pair`). md5
    dominates the stage cost, so this is ~num_hashes/2 cheaper than
    hashing per family."""
    # no distinct pass: min over the shingle multiset == min over the set
    h1, h2 = km_hash_pair(F.md5(F.col("sh")))
    sh = exploded_shingles(df, text_col, id_col, shingle_k).select(
        id_col, h1.alias("h1"), h2.alias("h2")
    )
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(MINHASH_PRIME)).alias(
            f"s{i}"
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing ≥1 LSH band.

    shingle → minhash → band → explode bands → self-join per (band_idx,
    band_hash) bucket → distinct pairs. The join shuffles on band hashes, so
    cost scales with bucket sizes, not corpus².
    """
    sigs = minhash_signatures_df(df, text_col, id_col, num_hashes, shingle_k)
    r = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"s{b * r + j}").cast("string") for j in range(r)])
        )
        for b in range(bands)
    ]
    # Eager localCheckpoint: signatures are the *compressed* representation
    # (id + a few longs — tiny next to the corpus at any scale). A lazy
    # persist is not enough for a self-join — both sides would start
    # computing the signature aggregate before cache blocks land, doubling
    # the expensive stage — and a plain persist leaks: CacheManager pins the
    # blocks until an explicit unpersist no caller can safely issue on a
    # frame the result still reads. localCheckpoint materializes once and
    # the ContextCleaner frees the blocks when the frame is unreferenced.
    banded = sigs.select(
        id_col, F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    ).localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Exact Jaccard similarity over distinct char-shingle sets, computed
    only for the given candidate pairs (the LSH-verify step).

    |A∩B| via exploded shingle join restricted to candidates; |A∪B| =
    |A|+|B|−|A∩B|. Integer counts → one final division → deterministic.

    Only documents that appear in a candidate pair are exploded (semi-join
    first) — verify cost scales with |candidates|, not corpus size.
    """
    # localCheckpoint, not persist: pairs feed three consumers (semi-join,
    # intersection join, final left join); eager materialization computes
    # the LSH pipeline once and the blocks are GC-cleaned when unreferenced
    pairs = pairs.localCheckpoint()
    sh = exploded_shingles(
        _candidate_docs(df, pairs, id_col), text_col, id_col, shingle_k
    ).distinct()
    return _pair_jaccard(sh, pairs, id_col)


def ngram_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs — same verify shape as
    ``jaccard_for_pairs`` but over word n-gram sets instead of char
    shingles."""
    pairs = pairs.localCheckpoint()  # see jaccard_for_pairs
    grams = exploded_word_ngrams(
        _candidate_docs(df, pairs, id_col), n, text_col, id_col
    ).distinct()
    return _pair_jaccard(grams, pairs, id_col)


def _candidate_docs(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Docs appearing in at least one candidate pair (broadcast semi-join)."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    return df.join(F.broadcast(cand_ids), id_col, "left_semi")


def _pair_jaccard(sh: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Jaccard from distinct (id, sh) item rows, for the given pairs."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh"))
    inter = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def near_dedup(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    sims: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Near-duplicate removal: drop any doc similar (≥ threshold) to a
    lower-id doc. Single-pass greedy (not transitive closure — documented:
    B dropped for A, C dropped for B but not A, stays dropped; at corpus
    scale the iterative connected-components pass is a separate job).

    ``sims`` overrides the internally-computed LSH+Jaccard pair frame
    (must carry id_a, id_b, jaccard) — pass a precomputed/shared index."""
    if sims is None:
        cands = minhash_lsh_candidates(df, text_col, id_col, **lsh_kwargs)
        sims = jaccard_for_pairs(df, cands, text_col, id_col)
    losers = (
        sims.filter(F.col("jaccard") >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def winnowed_fingerprints(
    df: DataFrame,
    shingle_k: int = DEFAULT_SHINGLE_K,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    algorithm): hash every char k-gram (rolling-hash family), slide a
    window of ``window`` consecutive hashes, keep each full window's
    minimum; the distinct kept hashes are the document's fingerprint set.
    Guarantee: documents sharing a substring of length ≥ k + window − 1
    share at least one fingerprint. Documents too short for a full window
    contribute the minimum over what they have (≥1 fingerprint per doc).

    Plan: shingle explode behind a Generate barrier (regexp-normalize once
    per doc), one window shuffle keyed by doc id, distinct. Fingerprints
    are ~1/window of the shingle count — the compressed sketch you'd index
    for containment search at 100 TB."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    n = F.length(F.col("_norm"))
    sh = (
        df.select(F.col(id_col), normalize_text(text_col).alias("_norm"))
        .select(
            id_col,
            "_norm",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(n - F.lit(shingle_k - 1), F.lit(1))
                )
            ).alias("pos"),
        )
        .select(
            id_col,
            "pos",
            F.col("_norm").substr(F.col("pos"), F.lit(shingle_k)).alias("sh"),
            F.greatest(
                F.length("_norm") - F.lit(shingle_k - 1), F.lit(1)
            ).alias("_n_sh"),
        )
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        sh.withColumn("_h", portable_hash(0, F.col("sh")))
        .withColumn("_wmin", F.min("_h").over(w))
        .filter(
            F.col("pos")
            <= F.greatest(F.col("_n_sh") - F.lit(window - 1), F.lit(1))
        )
        .select(F.col(id_col), F.col("_wmin").alias("fp"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    max_iters: int = 50,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components of the similarity pair graph via iterative
    min-label propagation to fixpoint: every vertex ends with the smallest
    id reachable from it.

    Each round is one shuffle join (labels onto edges) plus one min-agg;
    rounds needed = graph diameter (near-dup graphs are shallow — dup
    clusters are cliques-ish, so this converges in 2-3 rounds in practice).
    The labels frame is two longs per *paired* doc — tiny next to the
    corpus at any scale. For adversarial long-chain graphs at 100 TB,
    swap in the alternating large-star/small-star variant (O(log n)
    rounds); the fixpoint loop and convergence check stay identical.

    Below ``driver_threshold`` edges (the same kind of size gate as a
    broadcast-join threshold — ~16 MB of (long, long) rows at the default)
    the graph is collected once and solved with union-find on the driver:
    the fixpoint loop costs ≥2 scheduled jobs per round, pure overhead on
    an index-metadata-sized edge list. Identical output either way (the
    gate is an execution strategy, not a semantics change).

    Input: (id_a, id_b) pairs. Output: (id, comp) with comp = min id of
    the component. Only vertices that appear in a pair are returned.
    """
    # one full-parallel materialization (limit().collect() would instead
    # re-run the upstream pipeline through CollectLimit's scale-up probes);
    # count + collect on the checkpointed blocks are then free
    pairs = pairs.localCheckpoint()
    if pairs.count() <= driver_threshold:
        return _union_find_components(pairs, pairs.collect())
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist): each round's frame must TRUNCATE its
    # lineage, or the nested logical plan grows per iteration and Catalyst
    # re-analysis dominates (~minutes by round 7). On a cluster, swap for
    # reliable checkpoint() if executor loss during the loop matters.
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # min label among self and neighbours
        prop = edges.join(
            labels.withColumnRenamed("id", "dst"), "dst"
        ).select(F.col("src").alias("id"), "comp")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("comp", "nc")
            .join(labels.withColumnRenamed("comp", "oc"), "id")
            .filter(F.col("nc") != F.col("oc"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def _union_find_components(pairs: DataFrame, rows) -> DataFrame:
    """Driver-side union-find over a collected edge list; returns the same
    (id, comp=min id of component) frame as the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for v in parent:
        root = find(v)
        m = comp_min.get(root)
        if m is None or v < m:
            comp_min[root] = v
    out = [(v, comp_min[find(v)]) for v in parent]
    id_type = pairs.schema["id_a"].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("comp", id_type)]
    )
    return pairs.sparkSession.createDataFrame(out, schema)


def near_dedup_cc(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    sims: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Transitive-closure near-dedup: one survivor (the minimum id) per
    connected component of the ≥threshold similarity graph — the pass
    :func:`near_dedup` documents as missing. Greedy and CC differ when a
    doc links two otherwise-dissimilar lower-id docs: edges (A,C),(B,C)
    with A<B<C — greedy keeps A and B, CC recognizes {A,B,C} as one
    component and keeps only A.

    ``sims`` overrides the internally-computed LSH+Jaccard pair frame
    (must carry id_a, id_b, jaccard) — used by tests and by pipelines
    that already verified pairs."""
    if sims is None:
        cands = minhash_lsh_candidates(df, text_col, id_col, **lsh_kwargs)
        sims = jaccard_for_pairs(df, cands, text_col, id_col)
    edges = sims.filter(F.col("jaccard") >= F.lit(threshold)).select("id_a", "id_b")
    labels = connected_components(edges)
    losers = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-document SimHash over distinct lowercase tokens.

    Exploded formulation (token × bit → ±1 votes → majority per bit →
    weighted sum): two hash aggregations, both map-side combinable —
    distributed-friendly at any corpus size, and exactly expressible in
    portable SQL for the oracle.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(tokens_expr(normalize_text(text_col)))
        ).alias("tok"),
    ).withColumn("h", portable_hash(0, F.col("tok")))
    votes = (
        toks.select(
            id_col,
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .withColumn(
            # column-arg shifts need the SQL form (PySpark wrappers take ints)
            "vote",
            F.expr("(shiftright(h, CAST(bit AS INT)) & 1) * 2 - 1"),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bit_val",
            F.when(
                F.col("v") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy(id_col)
        .agg(F.sum("bit_val").alias("simhash"))
    )


def cross_split_contamination(
    df: DataFrame,
    split_label: Column,
    train_label: str = "train",
    test_label: str = "test",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = DEFAULT_SHINGLE_K,
    window: int = 4,
) -> DataFrame:
    """Benchmark-decontamination check: test-split documents sharing at
    least one winnowing fingerprint (≥ k+window−1 char substring) with any
    train-split document, with the shared-fingerprint count — the standard
    n-gram-overlap contamination audit a training-data pipeline runs before
    an eval release (GPT-3 appendix C / PaLM §7 style, built from public
    winnowing).

    Shape: fingerprints once over the whole corpus (shingle explode + one
    window shuffle), then split labels RECOMPUTED per row from the id via
    ``split_label`` (a pure column expression, e.g.
    ``sampling.split_expr()``) — no assignment-table join at all, the
    leakage-safe-join property split_assign advertises — then a semi-join
    of test fingerprints against the distinct train fingerprint set.
    Everything is exact integer hashing — no probabilistic misses beyond
    winnowing's guarantee."""
    fps = winnowed_fingerprints(
        df, shingle_k=shingle_k, window=window, text_col=text_col, id_col=id_col
    )
    labeled = fps.withColumn("_split", split_label)
    train_fps = (
        labeled.filter(F.col("_split") == train_label).select("fp").distinct()
    )
    return (
        labeled.filter(F.col("_split") == test_label)
        .join(train_fps, on="fp", how="leftsemi")
        .groupBy(id_col)
        .agg(F.countDistinct("fp").alias("n_shared_fps"))
        .orderBy(id_col)
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs: candidate generation by byte-band
    bucketing (pigeonhole: any pair within ``bands−1`` bit flips shares at
    least one identical band — exact recall for ``max_hamming < bands``),
    then a bit_count(xor) verification. The pairing half of the SimHash
    pipeline the signature operator alone leaves implicit.

    Plan: the signature aggregation, a band explode (bands× the signature
    rows — tiny: one row per doc), a bucketed self-join on (band, value)
    — Σbucket² like the MinHash LSH join, never all-pairs — and a
    distinct + exact Hamming filter. Everything stays in built-in integer
    expressions.
    """
    width = bits // bands
    sig = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    banded = sig.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftright(simhash, {b * width})"
                        f" & {(1 << width) - 1}"
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("_sa").bitwiseXOR(F.col("_sb"))
    ).cast("long")
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )
