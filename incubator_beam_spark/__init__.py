"""incubator_beam_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Apache Beam (reference:
apache/incubator-beam), re-designed Spark-first.

Design stance (SURVEY.md §7): a PCollection is a DataFrame with
conventions (event-time column, optional window struct); a PTransform is a
composable ``DataFrame -> DataFrame`` function; the runner is Spark itself.
Beam's portability layer (protos, coders, Fn API, SDK workers) has no
counterpart here — Catalyst/Arrow are the coders, the DAG, and the
scheduler.
"""

__version__ = "0.1.0"
