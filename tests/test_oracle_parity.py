"""Every registry query must hash-match its DuckDB oracle — the local
version of the driver's t2 correctness gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from cardinalsin_spark import queries as q
from tests.oracle_harness import compare

CASES = sorted(name for name, (_, sql) in q.REGISTRY.items() if sql is not None)


# emb_ivf_topk's oracle inlines centroids trained on the sf0.01 sample (the
# driver's correctness scale) — it is only meaningful there, so its parity
# case runs at sf0.01 like the driver gate does.
SF_PINNED = {
    "emb_ivf_topk": "/root/testdata/sf0.01",
    "emb_ivf_recall": "/root/testdata/sf0.01",
    "emb_ivfpq_topk": "/root/testdata/sf0.01",
    "emb_ivfpq_recall": "/root/testdata/sf0.01",
    "emb_ivfpq_residual_topk": "/root/testdata/sf0.01",
    "emb_semdedup": "/root/testdata/sf0.01",
    "emb_pca_project": "/root/testdata/sf0.01",
}


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, sf_dir, name):
    fn, sql = q.REGISTRY[name]
    sf = SF_PINNED.get(name, sf_dir)
    df = fn(spark, sf)
    exact, approx, detail = compare(df, sql, sf)
    assert exact, f"{name}: {detail} (approx_ok={approx})"
