"""Deferred-pandas API passthrough (SURVEY.md §2.9): the reference's
DeferredDataFrame surface via pyspark.pandas, checked against both plain
pandas semantics and the Spark DataFrame path."""

from __future__ import annotations

import pytest

from incubator_beam_spark.dataframe import to_dataframe, to_pcollection

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from incubator_beam_spark.catalog import table

    return table(spark, SF_DIR, "documents")


def test_roundtrip_preserves_schema_and_rows(spark, docs):
    pdf = to_dataframe(docs.select("doc_id", "source"))
    back = to_pcollection(pdf)
    assert set(back.columns) == {"doc_id", "source"}
    assert back.count() == docs.count()


def test_deferred_groupby_agg_matches_dataframe(spark, docs):
    pdf = to_dataframe(docs.select("source", "doc_id"))
    got = pdf.groupby("source")["doc_id"].count().sort_index().to_pandas()
    expected = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert got.to_dict() == expected


def test_deferred_filter_and_column_expr(spark, docs):
    pdf = to_dataframe(docs.select("doc_id", "text"))
    n_deferred = len(pdf[pdf.doc_id < 10])
    n_df = docs.filter("doc_id < 10").count()
    assert n_deferred == n_df


def test_merge_is_a_catalyst_join(spark, docs):
    pdf = to_dataframe(docs.select("doc_id", "source"))
    merged = pdf.merge(pdf, on="doc_id", suffixes=("_l", "_r"))
    assert len(merged) == docs.count()  # doc_id is unique -> 1:1 join
