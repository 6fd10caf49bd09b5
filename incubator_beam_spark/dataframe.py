"""Deferred-pandas DataFrame API (SURVEY.md §2.9).

The reference implements a deferred pandas dialect from scratch
(``sdks/python/apache_beam/dataframe/`` — DeferredDataFrame/DeferredSeries
at ``frames.py:2031,1070``, expression DAG in ``expressions.py``,
shuffle placement in ``partitionings.py``, conversion via
``convert.py:to_dataframe/to_pcollection``). Spark already ships that
exact product as ``pyspark.pandas`` (pandas-on-Spark, the Koalas
lineage): deferred pandas semantics lowered onto Catalyst, with the same
"some ops need a global order/shuffle" caveats. We adopt it rather than
rebuild it; these adapters mirror the reference's convert API names.

Scale: pandas-on-Spark inherits Catalyst planning — groupby/agg become
HashAggregates, merges become joins with AQE. The one sharp edge is the
default index (a distributed sequence needs a global ordering); we pin
``distributed`` (no ordering, no shuffle) unless the caller asks
otherwise, matching the reference's "PCollections are unordered" model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PS_OPTS = {"compute.default_index_type": "distributed"}


def _ps():
    import pyspark.pandas as ps

    for k, v in _PS_OPTS.items():
        ps.set_option(k, v)
    return ps


def to_dataframe(df: DataFrame):
    """PCollection -> deferred pandas (reference ``convert.to_dataframe``)."""
    return _ps().DataFrame(df)


def to_pcollection(pdf) -> DataFrame:
    """Deferred pandas -> PCollection (reference ``convert.to_pcollection``).
    Drops the synthetic index, like the reference drops unnamed indexes."""
    return pdf.to_spark()


def read_csv(spark, path: str, **kwargs):
    """Reference ``dataframe/io.py:read_csv`` -> pandas-on-Spark read_csv."""
    return _ps().read_csv(path, **kwargs)


def read_parquet(spark, path: str, **kwargs):
    return _ps().read_parquet(path, **kwargs)
