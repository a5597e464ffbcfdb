"""Job/data-feed metrics and chargeback accounting.

Reference parity: M/common/metrics — DataFeedMetrics/JobMetrics collect
named long/timer metrics with tag maps and emit through pluggable
reporters (ConsoleReporter etc.); IChargebackCalculator attributes row
counts per feed for cost accounting
(M/common/metrics/IChargebackCalculator.java,
KafkaWorkUnitCalculator.java:392-396).

Spark-first: counts that concern the data plane come from ``observe()``/
ForkOperator (no extra actions); this module is the driver-side registry
those numbers land in.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field
from typing import Mapping, Protocol


@dataclass
class Metric:
    name: str
    value: float
    tags: dict[str, str] = field(default_factory=dict)
    unit: str = "count"
    ts: float = field(default_factory=time.time)


class Reporter(Protocol):
    def report(self, metric: Metric) -> None: ...


class ConsoleReporter:
    def __init__(self, stream=None) -> None:
        self.stream = stream or sys.stderr

    def report(self, metric: Metric) -> None:
        print(json.dumps({"metric": metric.name, "value": metric.value,
                          "unit": metric.unit, "tags": metric.tags}),
              file=self.stream)


class InMemoryReporter:
    def __init__(self) -> None:
        self.metrics: list[Metric] = []

    def report(self, metric: Metric) -> None:
        self.metrics.append(metric)


class DataFeedMetrics:
    """Named metrics for one feed/job, fanned out to reporters on emit."""

    def __init__(self, feed_name: str, tags: Mapping[str, str] | None = None) -> None:
        self.feed_name = feed_name
        self.base_tags = dict(tags or {})
        self._metrics: list[Metric] = []

    def create_long_metric(self, name: str, value: int,
                           tags: Mapping[str, str] | None = None) -> Metric:
        m = Metric(name, float(value),
                   {**self.base_tags, "feed": self.feed_name, **(tags or {})})
        self._metrics.append(m)
        return m

    def create_timer_metric(self, name: str, seconds: float,
                            tags: Mapping[str, str] | None = None) -> Metric:
        m = Metric(name, seconds,
                   {**self.base_tags, "feed": self.feed_name, **(tags or {})},
                   unit="sec")
        self._metrics.append(m)
        return m

    def timed(self, name: str) -> "_Timer":
        return _Timer(self, name)

    def emit(self, *reporters: Reporter) -> None:
        for r in reporters:
            for m in self._metrics:
                r.report(m)

    @property
    def metrics(self) -> list[Metric]:
        return list(self._metrics)


class _Timer:
    def __init__(self, feed: DataFeedMetrics, name: str) -> None:
        self.feed = feed
        self.name = name

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.feed.create_timer_metric(self.name, time.time() - self._t0)
        return False


def write_metrics_table(spark, metrics: "list[Metric]", path: str) -> int:
    """Persist metrics as a date-partitioned parquet diagnostic table.

    Reference parity: UtilTable<MetricRecord> (M/common/dataset/
    UtilTable.java:47-95) — typed diagnostic records written as
    date-partitioned parquet. Returns rows written."""
    import datetime

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.DoubleType()),
        T.StructField("datestr", T.StringType()),
    ])
    rows = [(m.name, float(m.value), m.unit, dict(m.tags), float(m.ts),
             datetime.datetime.fromtimestamp(m.ts, datetime.timezone.utc)
             .strftime("%Y-%m-%d"))
            for m in metrics]
    if not rows:
        return 0
    (spark.createDataFrame(rows, schema)
     .write.mode("append").partitionBy("datestr").parquet(path))
    return len(rows)


class ChargebackCalculator:
    """Attributes processed-row cost per (feed, key) — IChargebackCalculator."""

    def __init__(self, cost_per_million_rows: float = 1.0) -> None:
        self.rate = cost_per_million_rows
        self._rows: dict[str, int] = {}

    def add_cost(self, feed: str, rows: int) -> None:
        self._rows[feed] = self._rows.get(feed, 0) + int(rows)

    def computed_costs(self) -> dict[str, float]:
        return {f: r / 1_000_000 * self.rate for f, r in self._rows.items()}
