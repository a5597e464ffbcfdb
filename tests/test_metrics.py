"""Metrics / chargeback registry (driver-side, no Spark needed)."""

import json

from marmaray_spark.metrics import (
    ChargebackCalculator,
    ConsoleReporter,
    DataFeedMetrics,
    InMemoryReporter,
)


def test_long_and_timer_metrics_tagging():
    feed = DataFeedMetrics("kafka-ingest", tags={"dc": "local"})
    feed.create_long_metric("valid_rows", 120)
    feed.create_long_metric("error_rows", 3, tags={"stage": "convert"})
    with feed.timed("write"):
        pass

    names = [m.name for m in feed.metrics]
    assert names == ["valid_rows", "error_rows", "write"]
    m0, m1, m2 = feed.metrics
    assert m0.tags == {"dc": "local", "feed": "kafka-ingest"}
    assert m1.tags["stage"] == "convert"
    assert m2.unit == "sec" and m2.value >= 0.0


def test_emit_fans_out_to_reporters(capsys):
    feed = DataFeedMetrics("f")
    feed.create_long_metric("rows", 7)
    mem = InMemoryReporter()
    import sys

    feed.emit(mem, ConsoleReporter(stream=sys.stdout))
    assert [m.value for m in mem.metrics] == [7.0]
    line = capsys.readouterr().out.strip()
    assert json.loads(line)["metric"] == "rows"


def test_chargeback_accumulates_per_feed():
    cb = ChargebackCalculator(cost_per_million_rows=2.0)
    cb.add_cost("feed_a", 500_000)
    cb.add_cost("feed_a", 500_000)
    cb.add_cost("feed_b", 250_000)
    costs = cb.computed_costs()
    assert costs["feed_a"] == 2.0
    assert costs["feed_b"] == 0.5


def test_write_metrics_table_date_partitioned(spark, tmp_path):
    from marmaray_spark.metrics import write_metrics_table

    feed = DataFeedMetrics("f1")
    feed.create_long_metric("rows", 10)
    feed.create_timer_metric("write", 1.5)
    out = str(tmp_path / "metrics_table")
    assert write_metrics_table(spark, feed.metrics, out) == 2

    back = spark.read.parquet(out)
    assert back.count() == 2
    assert "datestr" in back.columns
    got = {r["name"]: (r["value"], r["unit"]) for r in back.collect()}
    assert got["rows"] == (10.0, "count")
    assert got["write"] == (1.5, "sec")
    assert back.select("tags").first()["tags"]["feed"] == "f1"
