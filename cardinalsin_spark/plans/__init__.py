from cardinalsin_spark.plans.inspect import (  # noqa: F401
    involves_shuffle,
    plan_string,
    pushed_filters,
    scan_read_schema,
)
