"""TF-IDF over a document corpus (reference
``examples/complete/tfidf.py`` — Beam's CoGroupByKey showcase), on this
engine: the reference builds (word, doc) pairs and CoGroupByKeys three
derived collections; here the same quantities are three aggregates over
ONE tokenized scan, joined back by broadcast (word-level DF is
|vocab|-sized) — no CoGBK shuffle of the full token stream.

Usage: python examples/tfidf.py [documents.parquet]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def tfidf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf_idf): tf = word count / doc length, idf =
    ln(N / docs containing word)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"[^a-z']+")).alias("word"),
    ).filter(F.col("word") != "")
    tf = (
        toks.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n_wd"))
        .withColumn("n_d", F.sum("n_wd").over(W.partitionBy("doc_id")))
        .withColumn("tf", F.col("n_wd") / F.col("n_d"))
    )
    n_docs = docs.count()
    df_t = toks.distinct().groupBy("word").agg(F.count(F.lit(1)).alias("df_t"))
    return (
        tf.join(F.broadcast(df_t), "word")
        .withColumn("tf_idf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")))
        .select("doc_id", "word", "tf_idf")
    )


if __name__ == "__main__":
    from incubator_beam_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark("tfidf")
    docs = spark.read.parquet(src).select("doc_id", "text")
    tfidf(spark, docs).orderBy(F.desc("tf_idf")).show(20, truncate=False)
