"""Connected-components near-dedup: fixpoint convergence, and the case
where greedy drop and transitive closure disagree."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cardinalsin_spark.operators.dedup_docs import (
    connected_components,
    near_dedup,
    near_dedup_cc,
)


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_cc_labels_min_reachable(spark):
    # two components: {1,3,5} via a chain (needs >1 propagation round)
    # and {10, 12}
    labels = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, [(3, 5), (1, 3), (10, 12)])
        ).collect()
    }
    assert labels == {1: 1, 3: 1, 5: 1, 10: 10, 12: 10}


def test_cc_long_chain_converges(spark):
    # path 0-1-2-...-7: min label must travel the full diameter
    chain = [(i, i + 1) for i in range(7)]
    labels = {r.id: r.comp for r in connected_components(_pairs(spark, chain)).collect()}
    assert labels == {i: 0 for i in range(8)}


def test_cc_vs_greedy_divergence(spark):
    """Edges (A,C),(B,C) with A<B<C: greedy keeps A and B (B never matches
    a lower id), CC merges {A,B,C} through C and keeps only A."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in (1, 2, 3)]
    )
    sims = spark.createDataFrame(
        [
            Row(id_a=1, id_b=3, jaccard=0.9),
            Row(id_a=2, id_b=3, jaccard=0.9),
            Row(id_a=1, id_b=2, jaccard=0.1),
        ]
    )
    cc_survivors = {
        r.doc_id for r in near_dedup_cc(docs, threshold=0.6, sims=sims).collect()
    }
    assert cc_survivors == {1}
    # greedy semantics on the same sims frame: drop id_b of matching pairs
    greedy_losers = {
        r.id_b for r in sims.filter(F.col("jaccard") >= 0.6).collect()
    }
    greedy_survivors = {1, 2, 3} - greedy_losers
    assert greedy_survivors == {1, 2}  # the documented difference


def test_cc_pipeline_subset_of_greedy(spark, sf_dir):
    """On the real fixture the CC survivor set is a subset of greedy's
    (transitive closure can only drop more), with identical pair input."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    greedy = {r.doc_id for r in near_dedup(docs, threshold=0.6).collect()}
    cc = {r.doc_id for r in near_dedup_cc(docs, threshold=0.6).collect()}
    assert cc <= greedy
    assert len(cc) > 0


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k + window - 1 must share at
    least one fingerprint; unrelated docs (different alphabets) none."""
    from cardinalsin_spark.operators.dedup_docs import winnowed_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"AAAA {shared} BBBB"),
            Row(doc_id=2, text=f"CCCC {shared} DDDD"),
            Row(doc_id=3, text="0123456789" * 9),
        ]
    )
    fps = winnowed_fingerprints(docs, shingle_k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # short doc still yields at least one fingerprint
    tiny = spark.createDataFrame([Row(doc_id=9, text="abcdefgh")])
    assert winnowed_fingerprints(tiny).count() == 1


# ---------------------------------------------------------------------------
# SimHash banding (round-4 rebuild: 60-bit signature, 15-bit bands,
# capped secondary split for oversized buckets)
# ---------------------------------------------------------------------------


def test_simhash_secondary_split_is_exact(spark, sf_dir):
    """Forcing bucket_cap=1 routes EVERY bucket through the secondary
    sub-band split; the output pair set must equal the uncapped one
    (pigeonhole on the remaining 45 bits is exact for hamming <= 3)."""
    from cardinalsin_spark.operators.dedup_docs import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(docs, bucket_cap=10**9).collect()
    }
    split = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(docs, bucket_cap=1).collect()
    }
    assert split == base
    assert base, "fixture should contain at least one near-dup pair"


def test_simhash_secondary_split_scatters_dissimilar_colliders(spark):
    """The failure mode that melted round 3: many DISSIMILAR documents
    coinciding in one primary band bucket. Crafted signatures: 400 docs
    all share band 0 (low 15 bits) but have spread-out high bits (pairwise
    hamming ≫ 3), plus two planted near-dup pairs. The capped path must
    (a) return exactly the planted pairs and (b) scatter the collider
    bucket across sub-buckets so Σsub² ≪ s²."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.dedup_docs import (
        simhash_pairs_from_signatures,
    )

    import hashlib

    shared_band = 0x1234
    rows = []
    for i in range(400):
        # high 45 bits: md5-derived, so pairwise hamming ~22 — far above
        # the threshold (collision odds over 400 docs are negligible)
        digest = hashlib.md5(f"collider:{i}".encode()).hexdigest()
        high = int(digest[:12], 16) & ((1 << 45) - 1)
        rows.append(Row(doc_id=i, simhash=(high << 15) | shared_band))
    # planted near-dups: ids 1000/1001 differ in 1 bit; 1002/1003 in 3
    base = (0b101 << 40 << 15) | shared_band
    rows += [
        Row(doc_id=1000, simhash=base),
        Row(doc_id=1001, simhash=base | (1 << 20)),
        Row(doc_id=1002, simhash=base | (1 << 57)),
        Row(doc_id=1003, simhash=base | (1 << 57) | (1 << 21) | (1 << 22)),
    ]
    sig = spark.createDataFrame(rows)
    out = {
        (r.id_a, r.id_b)
        for r in simhash_pairs_from_signatures(
            sig, max_hamming=3, bucket_cap=50
        ).collect()
    }
    expected_subset = {(1000, 1001), (1002, 1003)}
    assert expected_subset <= out
    # any extra pairs must genuinely be near-dups of the crafted colliders
    uncapped = {
        (r.id_a, r.id_b)
        for r in simhash_pairs_from_signatures(
            sig, max_hamming=3, bucket_cap=10**9
        ).collect()
    }
    assert out == uncapped  # exactness under forced split

    # scatter check: the collider signatures spread over many sub-buckets
    width = 15
    rem = sig.withColumn("_rem", F.expr(f"shiftright(simhash, {width})"))
    sub_w = 12
    subs = rem.select(
        F.explode(
            F.array(
                *[
                    F.expr(f"shiftright(_rem, {j * sub_w}) & {(1 << sub_w) - 1}")
                    for j in range(4)
                ]
            )
        ).alias("sub_val")
    )
    worst = (
        subs.groupBy("sub_val").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst < 100, f"sub-banding failed to scatter: max sub-bucket {worst}"


def test_cc_two_phase_long_chain_beats_diameter(spark):
    """Adversarial diameter: a 301-vertex path graph (diameter 300 ≫ 50
    max_iters). Min-label propagation would need 300 rounds; the
    large-star/small-star fixpoint must fully converge within the default
    max_iters. driver_threshold=0 forces the distributed path."""
    chain = [(i, i + 1) for i in range(300)]
    labels = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, chain), max_iters=50, driver_threshold=0
        ).collect()
    }
    assert labels == {i: 0 for i in range(301)}


def test_cc_two_phase_matches_union_find(spark):
    """Distributed two-phase output == driver union-find output on a mixed
    graph (several components, a cycle, a clique, a chain)."""
    import random

    rng = random.Random(7)
    edges = set()
    # clique 0-4, cycle 10-14, chain 20-29, random extra edges in 30-59
    for a in range(5):
        for b in range(a + 1, 5):
            edges.add((a, b))
    edges |= {(10, 11), (11, 12), (12, 13), (13, 14), (14, 10)}
    edges |= {(i, i + 1) for i in range(20, 29)}
    for _ in range(40):
        a, b = rng.randrange(30, 60), rng.randrange(30, 60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = _pairs(spark, sorted(edges))
    dist = {
        r.id: r.comp
        for r in connected_components(
            pairs, driver_threshold=0
        ).collect()
    }
    uf = {
        r.id: r.comp
        for r in connected_components(
            pairs, driver_threshold=10**9
        ).collect()
    }
    assert dist == uf


def test_simhash_pairs_match_bruteforce(spark):
    """Exactness property: on random crafted signatures the banded+capped
    candidate generation must find EXACTLY the brute-force hamming<=3
    pairs — no false negatives (pigeonhole), no false positives
    (bit_count verify)."""
    import hashlib
    import itertools

    from pyspark.sql import Row

    from cardinalsin_spark.operators.dedup_docs import (
        simhash_pairs_from_signatures,
    )

    sigs = {}
    for i in range(120):
        h = int(hashlib.md5(f"bf:{i}".encode()).hexdigest()[:15], 16)
        sigs[i] = h  # 60-bit
    # plant near-dups at controlled distances 0..4
    base = sigs[0]
    sigs[200] = base                      # hamming 0
    sigs[201] = base ^ (1 << 5)           # 1
    sigs[202] = base ^ (1 << 5) ^ (1 << 30)  # 2
    sigs[203] = base ^ (1 << 59) ^ (1 << 31) ^ (1 << 7)  # 3
    sigs[204] = base ^ 0b11110            # 4 -> must NOT match
    expected = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        d = bin(sigs[a] ^ sigs[b]).count("1")
        if d <= 3:
            expected.add((a, b, d))
    df = spark.createDataFrame(
        [Row(doc_id=k, simhash=v) for k, v in sigs.items()]
    )
    for cap in (10**9, 2):  # uncapped and forced-secondary-split
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_pairs_from_signatures(
                df, max_hamming=3, bucket_cap=cap
            ).collect()
        }
        assert got == expected, f"cap={cap}"
