"""Physical-plan inspection helpers.

The scale contract (SURVEY §4) is that filters/projections reach the parquet
scan and small-dim joins broadcast; these helpers make that checkable in
tests instead of eyeballed. PySpark 4 removed ``DataFrame.queryExecution``,
so we go through the py4j handle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan exactly as ``df.explain(mode)`` would print it."""
    jdf = df._jdf  # py4j DataFrame handle
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan node in the plan."""
    plan = plan_string(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema — verifies column pruning."""
    plan = plan_string(df, "formatted")
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def involves_shuffle(df: DataFrame) -> int:
    """Number of exchange (shuffle) nodes in the physical plan."""
    return plan_string(df, "simple").count("Exchange")


def is_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")
