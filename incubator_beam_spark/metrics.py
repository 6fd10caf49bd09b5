"""Metrics (reference ``metrics/metric.py:70,86,104``:
Metrics.counter/distribution/gauge).

Two complementary mechanisms, both cluster-native:
- ``observe()``-based declarative metrics: aggregate expressions evaluated
  inline with the job (no extra pass), collected via ``Observation`` —
  the idiomatic Spark analog of Beam's committed metrics.
- Python-side accumulators for counters incremented inside Python stages
  (ParDo callables), mirroring Beam's in-DoFn counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class MetricResults:
    observations: dict[str, Observation] = field(default_factory=dict)

    def get(self, name: str) -> dict[str, Any]:
        return self.observations[name].get


class Metrics:
    """Registry of named observations attached to DataFrames."""

    def __init__(self):
        self.results = MetricResults()

    def observe(self, df: DataFrame, name: str, **aggs: Column) -> DataFrame:
        """Attach metric aggregates evaluated with the next action on df.

        Example::

            metrics.observe(df, "scan", n=F.count(F.lit(1)),
                            max_price=F.max("o_totalprice"))
        """
        obs = Observation(name)
        self.results.observations[name] = obs
        return df.observe(obs, *[expr.alias(alias) for alias, expr in aggs.items()])

    @staticmethod
    def counter(spark, name: str):
        """Python-stage counter (reference ``metric.py:70``): a plain Spark
        accumulator usable inside ParDo callables."""
        acc = spark.sparkContext.accumulator(0)
        acc.name = name
        return acc

    @staticmethod
    def distribution_exprs(col: str) -> list[Column]:
        """Beam Distribution (min/max/count/sum) as one observe() set."""
        return [
            F.count(col).alias(f"{col}_count"),
            F.sum(col).alias(f"{col}_sum"),
            F.min(col).alias(f"{col}_min"),
            F.max(col).alias(f"{col}_max"),
        ]
