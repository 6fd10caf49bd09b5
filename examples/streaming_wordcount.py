"""Streaming wordcount (reference ``examples/streaming_wordcount.py`` —
the canonical unbounded pipeline): the SAME extraction+count logic as
examples/wordcount.py executed over an unbounded source with
micro-batch state. Swap the memory sink for Kafka/files in production.

Usage: python examples/streaming_wordcount.py [documents.parquet]
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded word counts (complete mode — counts revise as data
    arrives, exactly Beam's GlobalWindows + Repeatedly(AfterCount)
    accumulating shape)."""
    from incubator_beam_spark.streaming.source import stream_table

    lines = stream_table(spark, sf_dir, "documents")
    words = lines.select(
        F.explode(F.split(F.lower(F.col("text")), r"[^a-z']+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    name = f"stream_wc_{uuid.uuid4().hex[:8]}"
    q = counts.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


if __name__ == "__main__":
    from incubator_beam_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_wordcount")
    streaming_wordcount(spark, sf_dir).orderBy(F.desc("n")).show(20, truncate=False)
