from cardinalsin_spark.sources.tables import (  # noqa: F401
    SMALL_DIMS,
    TABLES,
    load_table,
    load_tables,
    register_views,
)
