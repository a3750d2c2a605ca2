"""IVF ANN: trainer determinism, cell assignment sanity, probed search
structure, and recall against the exact brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def centroids(emb):
    return sim.ivf_train_centroids(emb, k=8, iters=2)


def test_trainer_deterministic(emb, centroids):
    again = sim.ivf_train_centroids(emb, k=8, iters=2)
    assert np.array_equal(centroids, again)
    assert centroids.shape == (8, 64)


def test_assignment_covers_all_cells_reasonably(emb, centroids):
    assigned = emb.select(
        sim.ivf_assign_udf(centroids)(F.col("embedding")).alias("cell")
    )
    counts = {r.cell: r["count"] for r in assigned.groupBy("cell").count().collect()}
    assert set(counts) <= set(range(8))
    assert len(counts) >= 4  # k-means on random data fills most cells
    assert sum(counts.values()) == emb.count()


def test_ivf_topk_structure_and_recall(emb, centroids):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk_bruteforce(emb, queries, k=10)
    approx = sim.cosine_topk_ivf(emb, queries, centroids, k=10, nprobe=4)

    a_rows = approx.collect()
    per_query: dict[int, list] = {}
    for r in a_rows:
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rows in per_query.items():
        ranks = [r.rank for r in rows]
        assert ranks == sorted(ranks) and len(rows) <= 10
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)

    e_sets = {}
    for r in exact.collect():
        e_sets.setdefault(r.query_id, set()).add(r.vec_id)
    a_sets = {qid: {r.vec_id for r in rows} for qid, rows in per_query.items()}
    recalls = [
        len(e_sets[q] & a_sets.get(q, set())) / len(e_sets[q]) for q in e_sets
    ]
    # nprobe=4 of 8 cells scans ~half the corpus → decent recall even on
    # near-orthogonal random vectors
    assert sum(recalls) / len(recalls) >= 0.3, recalls


# ---------------------------------------------------------------------------
# IVF-PQ (product quantization on top of the coarse quantizer)
# ---------------------------------------------------------------------------


def test_pq_codebooks_deterministic_and_shaped(emb):
    cb1 = sim.pq_train_codebooks_local(emb, m=8, ks=16, iters=2, sample=500)
    cb2 = sim.pq_train_codebooks_local(emb, m=8, ks=16, iters=2, sample=500)
    assert np.array_equal(cb1, cb2)
    assert cb1.shape == (8, 16, 8)


def test_pq_encode_codes_in_range(emb):
    cb = sim.pq_train_codebooks_local(emb, m=8, ks=16, iters=2, sample=500)
    codes = emb.select(
        sim.pq_encode_udf(cb)(F.col("embedding")).alias("codes")
    ).collect()
    for r in codes:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_ivfpq_structure_and_recall_vs_pq_ceiling(emb, centroids):
    """IVF-PQ ranks by quantized reconstruction, so its ceiling is what
    FULL-scan ADC would return, not exact cosine. Structure: ranks ordered,
    scores descending; recall measured against the exact top-10 must beat
    chance, and widening nprobe must not lose candidates."""
    cb = sim.pq_train_codebooks_local(emb, m=8, ks=16, iters=2, sample=500)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sim.cosine_topk_ivfpq(
        emb, queries, centroids, cb, k=10, nprobe=4
    ).collect()
    per_query: dict[int, list] = {}
    for r in approx:
        per_query.setdefault(r.query_id, []).append(r)
    assert len(per_query) == 5
    for rows in per_query.values():
        assert [r.rank for r in rows] == sorted(r.rank for r in rows)
        scores = [r.adc_cosine for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(-1.1 <= s <= 1.1 for s in scores)

    exact = sim.cosine_topk_bruteforce(emb, queries, k=10)
    e_sets = {}
    for r in exact.collect():
        e_sets.setdefault(r.query_id, set()).add(r.vec_id)
    a_sets = {qid: {r.vec_id for r in rows} for qid, rows in per_query.items()}
    recalls = [
        len(e_sets[q] & a_sets.get(q, set())) / len(e_sets[q]) for q in e_sets
    ]
    # PQ at 16 codes/subspace on near-orthogonal random vectors is a
    # coarse sieve; anything clearly above the random baseline
    # (10/2000 = 0.5%) shows the lookup pipeline works end-to-end
    assert sum(recalls) / len(recalls) >= 0.05, recalls


def test_ivfpq_residual_beats_or_matches_raw_pq_recall(emb, centroids):
    """Residual codebooks quantize the (much smaller) coarse residuals, so
    at the same code budget recall@10 vs the exact top-10 must be at least
    as good as raw-vector PQ on average."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    raw_cb = sim.pq_train_codebooks_local(emb, m=8, ks=16, iters=2, sample=500)
    res_cb = sim.pq_train_residual_codebooks_local(
        emb, centroids, m=8, ks=16, iters=2, sample=500
    )
    exact = sim.cosine_topk_bruteforce(emb, queries, k=10)
    e_sets = {}
    for r in exact.collect():
        e_sets.setdefault(r.query_id, set()).add(r.vec_id)

    def mean_recall(df):
        sets = {}
        for r in df.collect():
            sets.setdefault(r.query_id, set()).add(r.vec_id)
        rs = [
            len(e_sets[q] & sets.get(q, set())) / len(e_sets[q])
            for q in e_sets
        ]
        return sum(rs) / len(rs)

    raw = mean_recall(
        sim.cosine_topk_ivfpq(emb, queries, centroids, raw_cb, k=10, nprobe=4)
    )
    res = mean_recall(
        sim.cosine_topk_ivfpq_residual(
            emb, queries, centroids, res_cb, k=10, nprobe=4
        )
    )
    assert res >= raw - 0.05, (res, raw)  # small tolerance for tie noise


def test_jl_projection_preserves_distances(spark, sf_dir):
    """JL lemma sanity: squared-distance ratios after the 64→16 ±1
    projection concentrate around the expected scale (E[|Rx|²] = d·|x|²).
    Checked on 30 deterministic pairs with a generous 3x band — this
    guards the projection wiring, not the lemma."""
    import os

    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.similarity import (
        quantize,
        random_projection,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        F.col("vec_id") < 31
    )
    proj = random_projection(emb, in_dim=64, out_dim=16)
    qv = emb.select(
        "vec_id", quantize(F.col("embedding")).alias("qv")
    )
    rows_q = {r.vec_id: r.qv for r in qv.collect()}
    rows_p = {r.vec_id: r.proj for r in proj.collect()}
    ratios = []
    for a in range(0, 30):
        b = a + 1
        d_orig = sum((x - y) ** 2 for x, y in zip(rows_q[a], rows_q[b]))
        d_proj = sum((x - y) ** 2 for x, y in zip(rows_p[a], rows_p[b]))
        # E[d_proj] = out_dim/1 · d_orig for ±1 entries... normalized:
        ratios.append(d_proj / (16 * d_orig))
    mean = sum(ratios) / len(ratios)
    assert 1 / 3 < mean < 3, mean


def test_kmeans_third_party_crosscheck():
    """Close the shared-trainer oracle blind spot: the IVF/SemDeDup oracles
    retrain via the same ``kmeans_numpy`` the engine uses, so the trainer
    itself was never independently checked. Replay the sf0.01 training run
    with a from-scratch pure-Python Lloyd loop that differs in every way
    that could hide a bug — direct Σ(x−c)² distances instead of the
    ‖c‖²−2x·c expansion, exactly-rounded math.fsum reductions instead of
    numpy pairwise sums — and require bit-equal centroids and identical
    assignments each round (verified to hold on the fixed fixture: the
    embedding values' sums are exact in float64)."""
    import math
    import os

    import duckdb
    import numpy as np
    import pytest

    from cardinalsin_spark.operators.similarity import kmeans_numpy

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.01 fixture missing")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{path}') "
        "ORDER BY vec_id LIMIT 1000"
    ).fetchall()
    con.close()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    k, iters = 16, 2
    ref = kmeans_numpy(X, k=k, iters=iters)

    # reference-free reimplementation (no numpy, no shared helpers)
    pts = [list(map(float, row)) for row in X.tolist()]
    cent = [row[:] for row in pts[:k]]
    for rnd in range(iters):
        cells = []
        for x in pts:
            best, best_d = 0, None
            for ci, c in enumerate(cent):
                d = math.fsum((xi - cj) ** 2 for xi, cj in zip(x, c))
                if best_d is None or d < best_d:
                    best_d, best = d, ci
            cells.append(best)
        # the engine's argmin over ‖c‖²−2x·c must pick the same cells
        d_np = (np.array(cent) ** 2).sum(axis=1)[None, :] - 2.0 * (
            X @ np.array(cent).T
        )
        assert (d_np.argmin(axis=1) == np.array(cells)).all(), f"round {rnd}"
        for ci in range(k):
            members = [x for x, cell in zip(pts, cells) if cell == ci]
            if members:
                n = len(members)
                cent[ci] = [math.fsum(col) / n for col in zip(*members)]

    assert np.array_equal(ref, np.array(cent)), (
        "trainer centroids diverge from independent replay"
    )


def test_pca_third_party_crosscheck():
    """Independent replay of the PCA trainer (the other shared-trainer
    oracle blind spot beside kmeans): fsum-reduced mean and covariance and
    a from-scratch cyclic-Jacobi eigensolver — sharing no reduction order,
    no algorithm, and no linear-algebra library with numpy's eigh — must
    reproduce the trainer's QUANTIZED components exactly (quantization to
    the 1e-6 grid absorbs the solvers' sub-1e-9 disagreement; verified
    stable on the fixed fixture, whose top-9 eigenvalue gaps are well
    clear of degeneracy)."""
    import math
    import os

    import duckdb
    import numpy as np
    import pytest

    from cardinalsin_spark.operators.similarity import (
        QUANT_SCALE,
        pca_train_components_local,
    )

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.01 fixture missing")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{path}') "
        "ORDER BY vec_id LIMIT 1000"
    ).fetchall()
    con.close()
    X = np.array([r[0] for r in rows], dtype=np.float64)

    class _Fake:
        def __init__(self, r):
            self._r = r

        def orderBy(self, *_):
            return self

        def select(self, *_):
            return self

        def collect(self):
            return self._r

    q_mean, q_comp = pca_train_components_local(_Fake(rows), k=8)

    n, d = X.shape
    mean = [math.fsum(X[:, j]) / n for j in range(d)]
    Xc = X - np.array(mean)
    C = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            v = math.fsum(Xc[:, i] * Xc[:, j]) / (n - 1)  # np.cov ddof=1
            C[i][j] = C[j][i] = v

    A = [row[:] for row in C]
    V = [[1.0 if i == j else 0.0 for j in range(d)] for i in range(d)]
    for _sweep in range(100):
        off = math.sqrt(
            sum(A[i][j] ** 2 for i in range(d) for j in range(d) if i != j)
        )
        if off < 1e-14:
            break
        for p in range(d - 1):
            for q in range(p + 1, d):
                if abs(A[p][q]) < 1e-18:
                    continue
                theta = (A[q][q] - A[p][p]) / (2 * A[p][q])
                t = (1 if theta >= 0 else -1) / (
                    abs(theta) + math.sqrt(theta * theta + 1)
                )
                c = 1 / math.sqrt(t * t + 1)
                s = t * c
                for k in range(d):
                    akp, akq = A[k][p], A[k][q]
                    A[k][p] = c * akp - s * akq
                    A[k][q] = s * akp + c * akq
                for k in range(d):
                    apk, aqk = A[p][k], A[q][k]
                    A[p][k] = c * apk - s * aqk
                    A[q][k] = s * apk + c * aqk
                for k in range(d):
                    vkp, vkq = V[k][p], V[k][q]
                    V[k][p] = c * vkp - s * vkq
                    V[k][q] = s * vkp + c * vkq
    eigvals = [A[i][i] for i in range(d)]
    order = sorted(range(d), key=lambda i: -eigvals[i])[:8]
    W = [[V[k][i] for k in range(d)] for i in order]
    for row in W:  # the trainer's sign convention: largest-|entry| positive
        m = max(range(d), key=lambda j: abs(row[j]))
        if row[m] < 0:
            for j in range(d):
                row[j] = -row[j]

    assert q_mean == [int(round(v * QUANT_SCALE)) for v in mean]
    assert q_comp == [
        [int(round(v * QUANT_SCALE)) for v in row] for row in W
    ], "trainer components diverge from independent Jacobi replay"


def test_ivf_and_ivfpq_recall_floors(spark):
    """VERDICT r8 item 5: a quantizer/codebook regression must fail
    loudly. The whole training pipeline is deterministic (lowest-id
    sample, fixed Lloyd rounds), so recall@10 at sf0.01 is exactly
    reproducible; the floors leave headroom only for fixture
    regeneration. IVF (nprobe=2/16 cells) retrieves most of the exact
    top-10; IVF-PQ's 8x16 codebooks lose more on this near-orthogonal
    synthetic fixture — the measured baseline is ~0.34, and the floor
    pins it from collapsing further."""
    from cardinalsin_spark.queries_llm import (
        q_emb_ivf_recall,
        q_emb_ivfpq_recall,
    )

    sf = "/root/testdata/sf0.01"
    ivf = q_emb_ivf_recall(spark, sf).collect()
    assert len(ivf) == 5
    assert sum(r.recall for r in ivf) / len(ivf) >= 0.6
    ivfpq = q_emb_ivfpq_recall(spark, sf).collect()
    assert len(ivfpq) == 5
    assert sum(r.recall for r in ivfpq) / len(ivfpq) >= 0.2


def test_hamming_signature_udf_matches_sql_expression(spark, sf_dir):
    """The GEMM pandas_udf signature (OPTIMIZATION r14) must be
    bit-identical to the SQL aggregate(zip_with(...)) formulation it
    replaced in hamming_topk — same md5-derived planes, exact int64 sums,
    same >=0 sign convention and 2^p packing."""
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.similarity import (
        hamming_signature_udf,
        sql_hyperplane_signature,
        sql_quantize,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.selectExpr("vec_id", f"{sql_quantize('embedding')} AS qv")
    sql_side = {
        r.vec_id: r.s
        for r in q.selectExpr(
            "vec_id", f"{sql_hyperplane_signature('qv', 64, 60)} AS s"
        ).collect()
    }
    udf_side = {
        r.vec_id: r.s
        for r in q.select(
            "vec_id", hamming_signature_udf(64, 60)(F.col("qv")).alias("s")
        ).collect()
    }
    assert sql_side == udf_side
