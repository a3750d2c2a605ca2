"""Every registry query must hash-match its DuckDB oracle — the local
version of the driver's t2 correctness gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from cardinalsin_spark import queries as q
from tests.oracle_harness import compare

CASES = sorted(name for name, (_, sql) in q.REGISTRY.items() if sql is not None)


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, sf_dir, name):
    fn, sql = q.REGISTRY[name]
    df = fn(spark, sf_dir)
    exact, approx, detail = compare(df, sql, sf_dir)
    assert exact, f"{name}: {detail} (approx_ok={approx})"
