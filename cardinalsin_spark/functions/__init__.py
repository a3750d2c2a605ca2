from cardinalsin_spark.functions.core import (  # noqa: F401
    label_matcher,
    time_bucket,
    time_bucket_ns,
)
