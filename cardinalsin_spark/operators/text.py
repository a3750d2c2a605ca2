"""Text-analysis operators for LLM training-data pipelines (beyond the
reference's surface — BASELINE.json north star): token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built-in column expressions (split/regexp/higher-order array
functions) — JVM-side, whole-stage-codegen, no Python UDFs — so the operators
scan-parallelize over any corpus size. All formulas are integer/single-
division arithmetic, so results are bit-deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language function-word lexicons for the n-gram/stopword heuristic.
# Deliberately small + static: the operator's value is its *shape* (vectorized
# scoring + argmax over languages), not lexicon quality.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

# Word-ish tokens: letter runs, digit runs, or single other non-space chars —
# the "BPE-ish" regex token model.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = LANG_LEXICONS["en"]


def widen_small_input(df: DataFrame) -> DataFrame:
    """Widen a narrow input to the cluster's parallelism before CPU-heavy
    per-row work (OPTIMIZATION r14; the ``exploded_shingles`` discipline
    generalized): a small parquet scan arrives as 1-5 partitions, which
    serializes a regex/tokenize-bound map stage on a few cores. At scale
    inputs already carry plenty of partitions and this is a no-op — the
    guard keeps the extra exchange out of any plan that doesn't need it.
    Measured at sf0.1: pii_scrub 1.54→0.53 s, lang_id 1.43→0.39 s,
    quality_features 0.56→0.23 s (5-run medians)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization (empty strings filtered: split on runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count via regexp extraction."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens_expr(text)
    sw = F.array(*[F.lit(s) for s in (stopwords or _STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.size(toks)


def punct_density(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.length(c)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach deterministic quality-signal columns: n_chars_m (measured),
    n_tokens, avg_token_len, stopword_ratio, punct_density.

    These are the standard cheap quality filters (length/punct/stopword
    ratios) used to gate LLM training corpora.
    """
    toks = tokens_expr(text_col)
    # total token chars == non-whitespace chars (tokens split on \s+): one
    # regexp pass instead of an array fold, and an exact integer either way
    non_ws = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    # NOT widened here: quality_features also runs mid-pipeline (e.g. the
    # clean-corpus chain after the dedup join), where an extra full-text
    # exchange measured a ~2x regression — raw-scan callers widen at the
    # call site instead (see queries_llm)
    return (
        df.withColumn("n_chars_m", F.length(text_col))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("avg_token_len", non_ws / F.size(toks))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("punct_density", punct_density(text_col))
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts over lowercase tokens."""
    toks = tokens_expr(text)
    out: dict[str, Column] = {}
    for lang, lex in LANG_LEXICONS.items():
        arr = F.array(*[F.lit(w) for w in lex])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the language with the most lexicon hits (ties → lexicon order,
    deterministic); zero hits everywhere → 'und'."""
    df = widen_small_input(df)
    scores = lang_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    # reversed so earlier languages win ties (left-most wins via last when())
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    out = df
    for lang in langs:
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out.withColumn("lang_pred", pred)


def exploded_terms(
    df: DataFrame, text_col: str = "text", id_col: str | None = "doc_id"
) -> DataFrame:
    """One row per normalized token occurrence — THE token stream contract
    shared by the index, term-weighting, and sketch paths (a change to
    normalization or the empty-token rule lands everywhere at once).
    Columns: [id_col,] term."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(F.split(normalize_text(text_col), " ")).alias("term")
    ]
    # deliberately NOT widen_small_input'd: every consumer aggregates or
    # joins right after the explode, so the shuffle that follows already
    # spreads the work — an extra full-text exchange here measured bm25
    # 0.77→1.3 s (A/B, 7-run medians)
    return df.select(*cols).filter(F.col("term") != "")


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace runs, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))


def fingerprint64(text: Column | str) -> Column:
    """64-bit-ish (60-bit) integer fingerprint — the join/shuffle-friendly
    key for dedup at scale (a long shuffles cheaper than 32-char strings)."""
    return F.conv(F.substring(fingerprint(text), 1, 15), 16, 10).cast("long")


def gopher_repetition(
    df: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    duplicate-word fraction and the fraction of characters covered by the
    most frequent word 2-gram — the repetition filters a training-data
    pipeline runs before dedup.

    Shape: posexplode the token array, build 2-grams with a lead window
    (one shuffle on doc_id, linear per doc), count per (doc, 2-gram) with
    map-side combine, take the per-doc top by (count desc, 2-gram asc —
    deterministic tie-break), and join back to per-doc totals. All counts
    are exact ints; each output fraction is a single int/int division, so
    results are bit-deterministic and oracle-checkable. At corpus scale
    this is the same explode-shuffle cost profile as MinHash shingling
    (``dedup_docs.minhash_signatures``).
    """
    words = df.select(
        doc_id,
        F.length(F.col(text_col)).alias("_chars"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "_pos", "_w"
        ),
    )
    wlead = Window.partitionBy(doc_id).orderBy("_pos")
    bigrams = words.withColumn(
        "_bg", F.concat(F.col("_w"), F.lit(" "), F.lead("_w").over(wlead))
    )
    counts = (
        bigrams.filter(F.col("_bg").isNotNull())
        .groupBy(doc_id, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wtop = Window.partitionBy(doc_id).orderBy(F.desc("_c"), F.asc("_bg"))
    top = (
        counts.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") == 1)
        .select(
            doc_id,
            F.col("_bg").alias("top_bigram"),
            F.col("_c").alias("top_bigram_count"),
        )
    )
    stats = words.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("total_words"),
        F.countDistinct("_w").alias("distinct_words"),
        F.max("_chars").alias("_chars"),
    )
    return (
        stats.join(top, on=doc_id, how="left")
        .select(
            doc_id,
            "total_words",
            "distinct_words",
            (
                (F.col("total_words") - F.col("distinct_words"))
                / F.col("total_words")
            ).alias("dup_word_frac"),
            "top_bigram",
            "top_bigram_count",
            (
                (F.col("top_bigram_count") * F.length("top_bigram"))
                / F.col("_chars")
            ).alias("top_bigram_char_frac"),
        )
        .orderBy(doc_id)
    )


# PII patterns chosen from the RE2 ∩ Java-regex common dialect so the same
# string runs identically in Spark and any RE2-based engine.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Regex PII detection + redaction: per-kind match counts and a
    scrubbed text with each match replaced by ``<KIND>``. Pure
    ``regexp_extract_all``/``regexp_replace`` expressions — JVM-side,
    codegen'd, linear per row; the standard pre-training scrub pass.
    SSN runs first so phone's digit-run pattern can't eat its groups."""
    out = widen_small_input(df)
    order = ["ssn", "email", "phone"]
    for kind in order:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    scrub = F.col(text_col)
    for kind in order:
        scrub = F.regexp_replace(
            scrub, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out.withColumn(out_col, scrub)


def corpus_frequency_score(
    df: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document corpus-frequency quality signals: mean corpus frequency
    of the document's words and the fraction of below-average-frequency
    ("rare") words — the unigram-LM perplexity proxy that avoids log()
    (libm rounding differs across engines; integer frequency sums don't).

    Two-pass shape: global word counts (one map-side-combined groupBy over
    the exploded corpus — the "build the unigram LM" pass), then a
    frequency join back to the exploded words and a per-doc aggregation.
    "Rare" is the scale-invariant integer comparison
    ``count(word) * |vocab| < |corpus tokens|`` (below the mean token
    frequency), so the signal is stable across corpus sizes. At 100 TB the
    global count table is vocab-sized (broadcastable); everything else is
    linear explode + two shuffles.
    """
    words = df.select(
        doc_id, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w")
    )
    counts = words.groupBy("_w").agg(F.count(F.lit(1)).alias("_gc"))
    totals = counts.agg(
        F.sum("_gc").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    joined = (
        words.join(F.broadcast(counts), on="_w")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_rare",
            F.when(F.col("_gc") * F.col("_vocab") < F.col("_total"), 1).otherwise(0),
        )
    )
    return (
        joined.groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_rare").alias("n_rare"),
            (F.sum("_rare") / F.count(F.lit(1))).alias("rare_frac"),
            (F.sum("_gc") / F.count(F.lit(1))).alias("mean_corpus_freq"),
        )
        .orderBy(doc_id)
    )


# ---------------------------------------------------------------------------
# Term weighting: TF-IDF top terms and BM25 retrieval scoring
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k most characteristic terms per document by a linear-idf TF-IDF
    weight: ``weight = tf · (N·scale // df)`` on exact int64 arithmetic.

    Determinism contract: classic tf·ln(N/df) needs ln, which is not
    correctly rounded by IEEE-754 (libm-dependent — the same reason this
    repo exposes sqrt but not exp/ln); the linear idf keeps the whole
    weight exact-integer so ranking and driver value-hashes are
    bit-identical across engines. This is the idf ordering (monotone in
    1/df), with linear rather than logarithmic damping.

    Scale: one explode pass, tf = hash agg on (doc, term), df = hash agg on
    term (vocab-sized), N broadcast as a 1-row aggregate (never collected);
    the tf⋈df join shuffles on term; top-k is a row_number window on doc.
    Overflow bound: tf·N·scale < 2⁶³ holds to N ≈ 9·10⁹ docs at tf ≤ 10³;
    beyond that, drop ``scale`` (ranking is scale-invariant).
    """
    toks = exploded_terms(df, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # one row per (doc, term) → count(*) per term IS the document frequency
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            # exact int64 `div` — a double `/` would round 5·10¹⁰/df before
            # the truncation and drift off DuckDB's exact `//` by one
            "weight",
            F.col("tf") * F.expr(f"(n_docs * {scale}) div df_t"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_t", "weight", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term query,
    k1 = 6/5 and b = 3/4 exactly (the standard 1.2 / 0.75).

    Bit-determinism: the tf-saturation ratio is cleared of fractions by
    multiplying through by 20·L (L = corpus token count), giving exact
    int64 numerator ``44·tf·L`` and denominator ``20·tf·L + 6·L + 18·dl·N``
    (dl = doc length); the idf is the log-free surrogate
    ``(N − df + 1)·scale // (df + 1)`` (same ordering as the
    Robertson–Sparck-Jones idf, linear damping — ln is libm-dependent,
    see tfidf_top_terms). Each term's contribution is floored onto an
    integer grid after ONE double multiply-divide chain, so the per-doc
    score is an exact int64 sum — accumulation-order-proof — with a single
    final division.

    Scale: tf filtered to the query's terms before any join (predicate
    pushdown straight onto the exploded stream), so state is
    O(N·|query|); corpus constants (N, L) ride a broadcast 1-row
    aggregate.
    """
    toks = exploded_terms(df, text_col, id_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("corpus_len")
    )
    # exact int64 `div` (not `/` — see tfidf_top_terms)
    idf_q = F.expr(f"((n_docs - df_t + 1) * {scale}) div (df_t + 1)")
    num = F.lit(44) * F.col("tf") * F.col("corpus_len")
    den = (
        F.lit(20) * F.col("tf") * F.col("corpus_len")
        + F.lit(6) * F.col("corpus_len")
        + F.lit(18) * F.col("dl") * F.col("n_docs")
    )
    contrib = F.floor(
        idf_q.cast("double") * num.cast("double") / den.cast("double")
    )
    scored = (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(consts))
        .withColumn("contrib", contrib)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            (F.sum("contrib").cast("double") / F.lit(float(scale))).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
    )


_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def char_diversity(df: DataFrame, text_col: str = "text", scale: int = 1_000_000) -> DataFrame:
    """Letter-histogram character diversity per document — the log-free
    sibling of character entropy (ln/log2 are libm-dependent, see
    tfidf_top_terms): Simpson/Gini impurity ``1 − Σ(cᵢ/n)²`` and the
    inverse-Simpson "effective alphabet size" ``n²/Σcᵢ²``, both emitted as
    exact int64 micros. Low diversity flags the mojibake / repeated-char /
    single-token junk a corpus quality gate drops.

    Shape: 26 constant-width length-diff counters per row (no explode, no
    shuffle, whole-stage codegen); the Σ folds run in pinned a→z order but
    are exact integers anyway. Overflow: n ≤ doc length, n²·scale < 2⁶³
    holds to ~3·10⁶ letters per doc.
    """
    lt = F.lower(F.col(text_col))
    cnts = F.array(
        *[
            (F.length(lt) - F.length(F.replace(lt, F.lit(c), F.lit("")))).cast(
                "long"
            )
            for c in _LETTERS
        ]
    )
    zero = F.lit(0).cast("long")
    # materialize the counter array ONCE: embedding `cnts` in each of the
    # three folds would replicate the 26-replace tree 3x — triple the
    # string scans and a codegen blowup
    staged = df.select("doc_id", cnts.alias("_c"))
    c = F.col("_c")
    n = F.aggregate(c, zero, lambda a, x: a + x)
    sumsq = F.aggregate(c, zero, lambda a, x: a + x * x)
    n_distinct = F.size(F.filter(c, lambda v: v > 0))
    base = staged.select(
        "doc_id",
        n.alias("_n"),
        sumsq.alias("_ss"),
        n_distinct.cast("int").alias("n_distinct_letters"),
    )
    return base.select(
        "doc_id",
        F.col("_n").alias("n_letters"),
        "n_distinct_letters",
        F.when(
            F.col("_n") > 0,
            F.expr(f"((_n * _n - _ss) * {scale}) div (_n * _n)"),
        )
        .otherwise(zero)
        .alias("simpson_micro"),
        F.when(F.col("_ss") > 0, F.expr(f"(_n * _n * {scale}) div _ss"))
        .otherwise(zero)
        .alias("inv_simpson_micro"),
    )


def zipf_ranks(
    df: DataFrame, text_col: str = "text", k: int = 100, scale: int = 1_000_000
) -> DataFrame:
    """Zipf head-coverage diagnostic: the top-k corpus terms by frequency
    with their rank, the rank·freq product (Zipf's law predicts it is
    ~constant), and the cumulative share of all token occurrences covered
    through that rank, in exact int64 micros. The standard corpus-health
    readout (is the head too heavy? how much mass do the top 100 terms
    carry?) without the libm-dependent log-log regression.

    Shape: one explode pass → vocab-sized hash agg → global top-k (k rows,
    WindowGroupLimit gives a map-side partial top-k); the cumulative sum
    windows over k rows on a single partition — bounded by k, not vocab.
    """
    freq = (
        exploded_terms(df, text_col, id_col=None)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = freq.agg(F.sum("freq").alias("n_tokens"))
    w_rank = Window.orderBy(F.desc("freq"), F.asc("term"))
    top = (
        freq.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(total))
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("cum_freq", F.sum("freq").over(w_cum))
        .select(
            "rank",
            "term",
            "freq",
            (F.col("rank") * F.col("freq")).alias("rank_freq"),
            F.expr(f"(cum_freq * {scale}) div n_tokens").alias("cum_share_micro"),
        )
        .orderBy("rank")
    )


def bigram_lift(
    df: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
    k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k collocations by co-occurrence LIFT:
    ``lift = P(ab)/(P(a)·P(b)) = n_ab·N / (n_a·n_b)`` — PMI's core without
    the log (ln is libm-dependent; lift preserves PMI's ranking exactly
    since log is monotone). Emitted as the exact integer
    ``n_ab·N·scale div (n_a·n_b)``.

    Shape: bigrams come from zipping the token array against its own
    tail — NO per-document window, no shuffle until the (a,b) count;
    unigram counts are vocab-sized broadcasts; N rides a 1-row aggregate.
    Overflow bound: n_ab·N·scale < 2⁶³ holds to N ≈ 3·10⁹ tokens at
    n_ab ≤ 10³; drop ``scale`` beyond (ranking is scale-invariant).
    """
    toks = df.select(F.split(normalize_text(text_col), " ").alias("_t"))
    # name the slices first: arrays_zip of anonymous expressions yields
    # positional struct fields ("0"/"1") that column refs can't reach
    sliced = toks.select(
        F.expr("slice(_t, 1, size(_t) - 1)").alias("_heads"),
        F.expr("slice(_t, 2, size(_t) - 1)").alias("_tails"),
        "_t",
    )
    pairs = sliced.select(
        F.explode(F.arrays_zip("_heads", "_tails")).alias("_p")
    ).select(F.col("_p._heads").alias("a"), F.col("_p._tails").alias("b"))
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    n_total = uni.agg(F.sum("n_w").alias("n_tokens"))
    bg = (
        pairs.filter((F.col("a") != "") & (F.col("b") != ""))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ua = F.broadcast(uni.select(F.col("w").alias("a"), F.col("n_w").alias("n_a")))
    ub = F.broadcast(uni.select(F.col("w").alias("b"), F.col("n_w").alias("n_b")))
    return (
        bg.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "lift_micro",
            F.expr(f"(n_ab * n_tokens * {scale}) div (n_a * n_b)"),
        )
        .orderBy(F.desc("lift_micro"), "a", "b")
        .limit(k)
        .select("a", "b", "n_ab", "n_a", "n_b", "lift_micro")
    )
