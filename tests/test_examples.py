"""The reference's canonical examples (wordcount, tfidf) run end-to-end
and match independent oracles — the 'a Beam user could switch' check."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

from .conftest import SF_DIR


def test_wordcount_matches_duckdb(spark, duck):
    from wordcount import wordcount

    lines = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("element")
    )
    got = {(r.word, r.n) for r in wordcount(spark, lines).collect()}
    want = {
        (r[0], r[1])
        for r in duck.execute(
            """
            SELECT word, count(*) AS n
            FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z'']+')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
            """
        ).fetchall()
    }
    assert got == want


def test_wordcount_pythonic_matches_sparkfirst(spark):
    from wordcount import wordcount, wordcount_pythonic

    lines = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("element")
    ).limit(50)
    a = {(r.word, r.n) for r in wordcount(spark, lines).collect()}
    b = {(r.word, r.n) for r in wordcount_pythonic(spark, lines).collect()}
    assert a == b


def test_tfidf_ranks_rare_terms_higher(spark):
    from tfidf import tfidf

    docs = spark.createDataFrame(
        [(1, "common common rare"), (2, "common word"), (3, "common word here")],
        ["doc_id", "text"],
    )
    out = {(r.doc_id, r.word): r.tf_idf for r in tfidf(spark, docs).collect()}
    assert out[(1, "rare")] > out[(1, "common")]
    assert abs(out[(2, "common")] - 0.0) < 1e-12  # in all docs -> idf 0... common appears in all 3


def test_streaming_wordcount_matches_batch(spark):
    from streaming_wordcount import streaming_wordcount
    from wordcount import wordcount

    lines = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("element")
    )
    batch = {(r.word, r.n) for r in wordcount(spark, lines).collect()}
    stream = {(r.word, r.n) for r in streaming_wordcount(spark, SF_DIR).collect()}
    assert stream == batch
