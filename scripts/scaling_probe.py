"""Per-query scaling probe: time every registry query at two scale
factors and report the runtime ratio against the 10x data ratio.

The 100 TB question is not "how fast at sf0.1" but "what exponent" — a
query whose runtime grows 10x when data grows 10x is linear (fine); one
growing 30x has a quadratic term that WILL melt at cluster scale even if
its sf0.1 wall-clock looks cheap. Fixed per-query overhead (~0.3-0.8 s of
plan/codegen) makes cheap queries look sublinear; the flag threshold only
considers queries whose large-scale time is big enough for the ratio to
be signal.

Usage: python scripts/scaling_probe.py [small_sf_dir large_sf_dir]
Writes SCALING_PROBE.json and prints a sorted table. Run on an otherwise
idle machine — contention fabricates ratios.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) not in (1, 3):
    # a single directory is ambiguous (small or large?) — refuse rather
    # than silently probing the defaults the caller didn't ask for
    raise SystemExit("usage: scaling_probe.py [small_sf_dir large_sf_dir]")
SMALL = sys.argv[1] if len(sys.argv) == 3 else "/root/testdata/sf0.01"
LARGE = sys.argv[2] if len(sys.argv) == 3 else "/root/testdata/sf0.1"
DATA_RATIO = 10.0
FLAG_RATIO = 2.0 * DATA_RATIO  # 2x superlinear headroom
MIN_LARGE_SEC = 1.0  # below this, fixed overhead dominates the ratio


def _noop_sink(df) -> None:
    df.foreach(lambda _: None)


def main() -> int:
    from cardinalsin_spark import queries as q
    from cardinalsin_spark.session import get_spark

    spark = get_spark()
    out: dict[str, dict] = {}
    for name, (fn, _) in q.REGISTRY.items():
        times = {}
        for label, sf in (("small", SMALL), ("large", LARGE)):
            t0 = time.time()
            try:
                _noop_sink(fn(spark, sf))
            except Exception as e:  # pragma: no cover
                times[label] = None
                times.setdefault("err", str(e)[:200])
                continue
            times[label] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        gc.collect()
        rec = {"small_s": times.get("small"), "large_s": times.get("large")}
        if times.get("small") and times.get("large"):
            rec["ratio"] = round(times["large"] / max(times["small"], 1e-3), 2)
            rec["flag"] = bool(
                rec["ratio"] > FLAG_RATIO and times["large"] >= MIN_LARGE_SEC
            )
        out[name] = rec
    with open("SCALING_PROBE.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    flagged = {k: v for k, v in out.items() if v.get("flag")}
    ranked = sorted(
        (x for x in out.items() if x[1].get("ratio")),
        key=lambda x: -x[1]["ratio"],
    )
    for name, rec in ranked[:15]:
        print(
            f"{rec['ratio']:7.2f}x  {rec['small_s']:7.2f}->"
            f"{rec['large_s']:7.2f}s  {name}{'  <== FLAG' if rec.get('flag') else ''}"
        )
    print(f"flagged: {sorted(flagged)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
