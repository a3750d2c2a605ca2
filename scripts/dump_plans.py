"""Dump .explain('formatted') for named registry queries to plans/<dir>/.

Usage: python scripts/dump_plans.py <outdir-suffix> name1 name2 ...
       python scripts/dump_plans.py <outdir-suffix> --all
Writes plans/$SPARK_GRAFT_PLAN_DIR/<name>_<suffix>.txt (default plans/r15;
driver-checkable plan evidence for the optimization rounds)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.queries()
    if names == ["--all"]:
        names = list(reg)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = reg[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "->", len(plan), "chars")
    return 0


if __name__ == "__main__":
    sys.exit(main())
