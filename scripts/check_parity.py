"""Quick parity check for a subset of registry queries at a given SF.

Usage: python scripts/check_parity.py [sf_dir] name1 name2 ...
       python scripts/check_parity.py --ages [--before N]
Runs each named registry query through Spark and its DuckDB oracle via
tests/oracle_harness.compare, printing one PASS/FAIL line per query.
Development aid only — the committed gate is tests/test_oracle_parity.py.

``--ages`` prints, for every registry query, the last round whose driver
CORRECTNESS file recorded it fully green (rows+schema+hash), grouped
oldest-first — the input for planning the next window rotation
(tests/test_registry_window.py), so rotation reads a report, not memory.
``--before N`` restricts to CORRECTNESS files from rounds < N, mirroring
the window tests' pinned ``WINDOW_ROUND`` cutoff — use it to reproduce the
planning view of a given round; without it the report includes every
artifact on disk, including the current round's (stated in the header).
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


def ages(before: int | None = None) -> int:
    """Print (last-green-round, count, names) per registry query, oldest
    first; 'never' for queries with no green driver row yet. ``before``
    excludes rounds >= N (the window tests' pinned-cutoff view)."""
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    used: list[int] = []
    last: dict[str, int] = {}
    for fname in sorted(os.listdir(repo)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        if before is not None and rnd >= before:
            continue
        used.append(rnd)
        with open(os.path.join(repo, fname)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    scope = (
        f"rounds < {before}" if before is not None
        else "ALL artifacts on disk (incl. any current-round file)"
    )
    print(f"# last-green ages over {scope}: r{min(used)}..r{max(used)}"
          if used else f"# no CORRECTNESS artifacts in scope ({scope})")
    by_round: dict[int, list[str]] = {}
    for name in q.REGISTRY:
        by_round.setdefault(last.get(name, 0), []).append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        tag = "never" if rnd == 0 else f"r{rnd}"
        print(f"{tag}: {len(names)}")
        for name in names:
            print(f"  {name}")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--ages":
        before = None
        if "--before" in args:
            before = int(args[args.index("--before") + 1])
        return ages(before)
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
