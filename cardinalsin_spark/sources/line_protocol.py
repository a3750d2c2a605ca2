"""InfluxDB line-protocol ingestion — the third wire format next to OTLP
and Prometheus remote-write (SURVEY §2.1 superset; the reference ingests
only its SQL/OTLP/remote-write surfaces).

Grammar handled (the public line-protocol subset used by telegraf-style
agents):

    measurement[,tag1=v1,tag2=v2] field1=1.5[,field2=42i] [timestamp_ns]

- pure DataFrame ops: regexp splits + ``map_from_entries`` — JVM-side,
  codegen'd, no Python row handling, so ingest parallelizes over any
  payload volume;
- one output row per (line, field) — multi-field lines explode, matching
  how a metrics store flattens field sets;
- integer fields (``42i``) route to the int64 column, floats to f64
  (``sources.ingest.route_value_types`` discipline);
- malformed lines are counted and dropped, never fail the batch (same
  contract as the remote-write decoder's per-payload isolation).

Escaped commas/spaces/equals inside identifiers (``\\,`` etc.) are out of
scope for this subset and treated as malformed — documented, tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measurement,tags fields [ts] — three space-separated sections (tags glued
# to the measurement with commas). Escapes are out of subset: reject lines
# containing backslashes outright.
_LINE_RE = r"^([^ \\]+) ([^ \\]+)( \d+)?$"


def parse_lines(
    lines: DataFrame, line_col: str = "line", default_ts_ns: int = 0
) -> DataFrame:
    """(line) → (metric_name, tags map, field, value_str, ts_ns, malformed).

    One row per field. ``metric_name`` is ``measurement_field`` (the
    conventional flattening when a line carries multiple fields);
    single-field lines named ``value`` keep the bare measurement name.
    """
    m = F.regexp_extract(F.col(line_col), _LINE_RE, 1)
    ts_str = F.trim(F.regexp_extract(F.col(line_col), _LINE_RE, 3))
    measurement = F.split(m, ",").getItem(0)
    tags = F.map_from_entries(
        F.expr(
            f"transform(filter(transform(slice(split(split({line_col}, ' ')[0], ','),"
            " 2, 1000), s -> split(s, '=')), p -> size(p) = 2),"
            " p -> struct(p[0] AS key, p[1] AS value))"
        )
    )
    field_entries = F.expr(
        f"filter(transform(split(split({line_col}, ' ')[1], ','), s -> split(s, '=')),"
        " p -> size(p) = 2)"
    )
    parsed = (
        lines.withColumn("_m", measurement)
        .withColumn("_ok", m != F.lit(""))
        .withColumn("tags", F.when(F.col("_ok"), tags))
        .withColumn(
            "ts_ns",
            # try_cast: an out-of-int64-range timestamp digit-run must mark
            # the line malformed, not throw under ANSI mode
            F.when(ts_str != "", ts_str.try_cast("long")).otherwise(
                F.lit(default_ts_ns)
            ),
        )
        .withColumn(
            "_fields", F.when(F.col("_ok"), field_entries).otherwise(F.array())
        )
    )
    exploded = parsed.select(
        F.col(line_col),
        "_m",
        "_ok",
        "tags",
        "ts_ns",
        F.explode_outer("_fields").alias("_fv"),
    )
    field = F.col("_fv").getItem(0)
    value_str = F.col("_fv").getItem(1)
    return exploded.select(
        F.col(line_col),
        F.when(
            F.col("_ok") & (field != F.lit("value")),
            F.concat(F.col("_m"), F.lit("_"), field),
        )
        .otherwise(F.col("_m"))
        .alias("metric_name"),
        "tags",
        field.alias("field"),
        value_str.alias("value_str"),
        "ts_ns",
        (~F.col("_ok") | F.col("_fv").isNull()).alias("malformed"),
    )


def lines_to_metrics(
    lines: DataFrame, line_col: str = "line", default_ts_ns: int = 0
) -> DataFrame:
    """Full adapter: parsed lines → metrics rows with routed value types.

    ``42i`` → value_i64/u64 (sign-routed), plain numbers → value_f64 via
    the shared :func:`route_value_types` discipline. Unparseable field
    values count as malformed. Returns only well-formed rows; use
    :func:`malformed_count` for the drop tally (ingest observability).
    """
    p = parse_lines(lines, line_col, default_ts_ns)
    is_int = F.col("value_str").rlike(r"^-?\d+i$")
    # try_cast everywhere: unparseable values become nulls (dropped +
    # counted), never ANSI cast exceptions that would fail the batch
    num = F.when(
        is_int,
        F.expr("substring(value_str, 1, length(value_str)-1)").try_cast("double"),
    ).otherwise(F.col("value_str").try_cast("double"))
    good = (
        p.filter(~F.col("malformed") & F.col("ts_ns").isNotNull())
        .withColumn("_num", num)
        .filter(F.col("_num").isNotNull())
    )
    from cardinalsin_spark.sources.ingest import route_value_types

    routed = route_value_types(good, "_num")
    return routed.select(
        F.timestamp_micros(F.expr("ts_ns div 1000")).alias("timestamp"),
        "ts_ns",
        "metric_name",
        "value_f64",
        "value_i64",
        "value_u64",
        "tags",
    )


def malformed_count(lines: DataFrame, line_col: str = "line") -> int:
    """Count of lines that fail the grammar (or carry no parseable field) —
    the per-batch drop tally an ingest pipeline reports."""
    p = parse_lines(lines, line_col)
    bad_field = (~F.col("malformed")) & (
        ~F.col("value_str").rlike(r"^-?\d+i$")
    ) & F.col("value_str").try_cast("double").isNull()
    return (
        p.filter(F.col("malformed") | bad_field | F.col("ts_ns").isNull())
        .select(line_col)
        .distinct()
        .count()
    )
