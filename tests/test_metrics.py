"""Metrics facade tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_beam_spark.metrics import Metrics

from .conftest import SF_DIR


def test_observe_metrics(spark):
    m = Metrics()
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    observed = m.observe(
        df, "scan", n=F.count(F.lit(1)), max_total=F.max("o_totalprice")
    )
    observed.filter(F.col("o_totalprice") > 0).count()  # trigger action
    got = m.results.get("scan")
    assert got["n"] == df.count()
    assert got["max_total"] > 0


def test_distribution_exprs(spark):
    m = Metrics()
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    observed = df.observe("dist", *Metrics.distribution_exprs("o_totalprice"))
    rows = observed.count()
    assert rows > 0


def test_python_counter(spark):
    acc = Metrics.counter(spark, "processed")
    rdd = spark.sparkContext.parallelize(range(100), 4)

    def f(x):
        acc.add(1)
        return x

    rdd.map(f).count()
    assert acc.value == 100
