"""The canonical wordcount pipeline (reference
``examples/wordcount.py`` — Beam's hello-world), on this engine:

    read text -> FlatMap(extract words) -> Count.PerElement -> format -> write

Two equivalent spellings, demonstrating the migration path for a
reference user:
- ``wordcount``: Spark-first — word extraction is a codegen'd
  split/explode expression (the idiomatic port; 10-100x faster than a
  per-element Python callable at scale);
- ``wordcount_pythonic``: the literal reference shape with a Python
  ``FlatMap(str.split)`` — runs through Arrow-batched mapInPandas.

Usage:
    python examples/wordcount.py [input_dir_or_file] [output_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_beam_spark.core import FlatMap, Map, PCollection, Pipeline
from incubator_beam_spark.transforms import Count


def wordcount(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """Spark-first spelling: the word extraction is one JVM expression."""
    p = Pipeline(spark)
    pc = PCollection(
        lines.select(
            F.explode(
                F.split(F.lower(F.col("element")), r"[^a-z']+")
            ).alias("element")
        ).filter(F.col("element") != ""),
        p,
    )
    counted = pc | Count.PerElement()
    return counted.df.select(
        F.col("key").alias("word"), F.col("value").alias("n")
    )


def wordcount_pythonic(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """The literal reference pipeline: Python FlatMap through Arrow."""
    import re

    p = Pipeline(spark)
    pc = PCollection(lines, p)
    words = pc | FlatMap(lambda line: re.findall(r"[a-z']+", line.lower()))
    counted = words | Count.PerElement()
    return counted.df.select(F.col("key").alias("word"), F.col("value").alias("n"))


if __name__ == "__main__":
    from incubator_beam_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark("wordcount")
    if src.endswith(".parquet"):
        lines = spark.read.parquet(src).select(F.col("text").alias("element"))
    else:
        lines = spark.read.text(src).select(F.col("value").alias("element"))
    out = wordcount(spark, lines).orderBy(F.desc("n"), "word")
    if len(sys.argv) > 2:
        out.write.mode("overwrite").csv(sys.argv[2])
    else:
        out.show(20, truncate=False)
