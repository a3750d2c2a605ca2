"""Quick parity check for a subset of registry queries at a given SF.

Usage: python scripts/check_parity.py [sf_dir] name1 name2 ...
Runs each named registry query through Spark and its DuckDB oracle via
tests/oracle_harness.compare, printing one PASS/FAIL line per query.
Development aid only — the committed gate is tests/test_oracle_parity.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from oracle_harness import compare  # noqa: E402

from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or list(q.queries().keys())
    spark = get_spark()
    reg = q.REGISTRY
    failures = 0
    for name in names:
        fn, sql = reg[name]
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            exact, approx, detail = compare(fn(spark, sf_dir), sql, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"{name}: ERROR {e}")
            failures += 1
            continue
        status = "PASS" if exact else ("APPROX" if approx else "FAIL")
        if not exact:
            failures += 1
        print(f"{name}: {status} {'' if exact else detail[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
