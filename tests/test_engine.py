"""Engine facade: ingest→sql→promql lifecycle, metadata endpoints, output
formats, dedup flag, adaptive-index accounting."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.engine import CardinalSin
from cardinalsin_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("engine") / "metrics")
    cs = CardinalSin(spark, path)
    ev = load_table(spark, sf_dir, "events")
    cs.ingest(
        ev, ts_col="ts_ns", name_col="event_type", value_col="value",
        label_cols={"user": "user_id"},
    )
    return cs


def test_sql_passthrough(engine, spark, sf_dir):
    n = engine.sql("SELECT count(*) AS n FROM metrics").first().n
    assert n == load_table(spark, sf_dir, "events").count()
    agg = engine.sql(
        "SELECT metric_name, count(*) AS n FROM metrics "
        "WHERE metric_name <> 'click' GROUP BY metric_name ORDER BY n DESC"
    )
    assert agg.count() > 0 and "click" not in {r.metric_name for r in agg.collect()}


def test_promql_entrypoints(engine):
    inst = engine.promql_instant('sum(click{user=~".*"})')
    assert inst.count() >= 1
    lo = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    hi = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp()
    rng = engine.promql_range("avg(click)", lo, hi, 3600)
    assert rng.count() > 0


def test_metadata_endpoints(engine):
    assert "metric_name" in engine.labels() and "user" in engine.labels()
    vals = engine.label_values("metric_name")
    assert vals.count() >= 2
    with pytest.raises(ValueError):
        engine.label_values("nope; DROP TABLE metrics")
    assert engine.series().count() >= vals.count()


def test_output_formats(engine, tmp_path):
    df = engine.sql("SELECT metric_name FROM metrics LIMIT 3")
    js = engine.to_json(df)
    assert len(js) == 3 and all(s.startswith("{") for s in js)
    tbl = engine.to_arrow(df)
    assert tbl.num_rows == 3
    engine.to_csv(df, str(tmp_path / "out_csv"))
    assert (tmp_path / "out_csv").exists()


def test_dedup_flag(spark, engine):
    engine.dedup = True
    try:
        n_all = engine.sql("SELECT timestamp, metric_name FROM metrics").count()
        n_distinct = (
            engine.metrics.select("timestamp", "metric_name").distinct().count()
        )
        assert n_all == n_distinct
    finally:
        engine.dedup = False


def test_index_recommendations(engine):
    for _ in range(3):
        engine.sql(
            "SELECT metric_name, count(*) FROM metrics "
            "WHERE user = 'u17' GROUP BY metric_name"
        )
    recs = engine.index_recommendations(min_uses=2)
    by_col = {r["column"]: r for r in recs}
    assert "user" in by_col
    assert by_col["user"]["filter_uses"] >= 2
    assert by_col["user"]["index_type"] in {"inverted", "range", "bloom_filter"}
