"""Unit tests for the Beam-style core API (reference test model:
``transforms/ptransform_test.py`` + assert_that/equal_to)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import incubator_beam_spark.core as ibs
from incubator_beam_spark.testing import assert_that, equal_to, is_empty


@pytest.fixture(scope="module")
def p(spark):
    return ibs.Pipeline(spark)


def test_create_roundtrip(p):
    pc = p | ibs.Create([1, 2, 3])
    assert_that(pc, equal_to([1, 2, 3]))


def test_map_python_fn(p):
    pc = p | ibs.Create([1, 2, 3]) | ibs.Map(lambda x: x * 10)
    assert_that(pc, equal_to([10, 20, 30]))


def test_map_column_expr(p):
    pc = p | ibs.Create([1, 2, 3]) | ibs.Map(F.col("element") + 1)
    assert_that(pc, equal_to([2, 3, 4]))


def test_flatmap(p):
    pc = p | ibs.Create(["a b", "c"]) | ibs.FlatMap(str.split)
    assert_that(pc, equal_to(["a", "b", "c"]))


def test_filter_python_and_expr(p):
    pc = p | ibs.Create([1, 2, 3, 4])
    assert_that(pc | ibs.Filter(lambda x: x % 2 == 0), equal_to([2, 4]))
    assert_that(pc | ibs.Filter(F.col("element") > 3), equal_to([4]))


def test_pardo_lifecycle(p):
    class SplitWords(ibs.DoFn):
        def setup(self):
            self.sep = " "

        def process(self, element):
            yield from element.split(self.sep)

    pc = p | ibs.Create(["x y", "z"]) | ibs.ParDo(SplitWords())
    assert_that(pc, equal_to(["x", "y", "z"]))


def test_group_by_key(p):
    pc = p | ibs.Create([("a", 1), ("a", 2), ("b", 3)]) | ibs.GroupByKey()
    out = {k: sorted(v) for k, v in pc.collect()}
    assert out == {"a": [1, 2], "b": [3]}


def test_combine_per_key_builtin_and_callable(p):
    data = [("a", 1), ("a", 2), ("b", 3)]
    assert_that(
        p | ibs.Create(data) | ibs.CombinePerKey("sum"), equal_to([("a", 3), ("b", 3)])
    )
    assert_that(
        p | ibs.Create(data) | ibs.CombinePerKey(max), equal_to([("a", 2), ("b", 3)])
    )


def test_combine_globally(p):
    assert_that(p | ibs.Create([1, 2, 3]) | ibs.CombineGlobally("sum"), equal_to([6]))
    assert_that(
        p | ibs.Create([1, 2, 3]) | ibs.CombineGlobally(lambda xs: sum(xs) + 100),
        equal_to([106]),
    )


def test_flatten(p):
    a = p | ibs.Create([1, 2])
    b = p | "other" >> ibs.Create([3])
    assert_that(a | ibs.Flatten(b), equal_to([1, 2, 3]))


def test_partition(p):
    parts = p | ibs.Create(list(range(6))) | ibs.Partition(lambda e, n: e % n, 2)
    assert_that(parts[0], equal_to([0, 2, 4]))
    assert_that(parts[1], equal_to([1, 3, 5]))


def test_distinct(p):
    assert_that(p | ibs.Create([1, 1, 2]) | ibs.Distinct(), equal_to([1, 2]))


def test_kv_projections(p):
    kv = p | ibs.Create([("a", 1), ("b", 2)])
    assert_that(kv | ibs.Keys(), equal_to(["a", "b"]))
    assert_that(kv | ibs.Values(), equal_to([1, 2]))
    assert_that(kv | ibs.KvSwap(), equal_to([(1, "a"), (2, "b")]))


def test_with_keys(p):
    assert_that(
        p | ibs.Create(["aa", "b"]) | ibs.WithKeys(len),
        equal_to([(2, "aa"), (1, "b")]),
    )


def test_reshuffle_preserves_elements(p):
    pc = p | ibs.Create(list(range(10))) | ibs.Reshuffle(4)
    assert_that(pc, equal_to(list(range(10))))
    assert pc.df.rdd.getNumPartitions() == 4


def test_empty_flatmap(p):
    assert_that(p | ibs.Create([1, 2]) | ibs.FlatMap(lambda x: []), is_empty())


def test_sql_transform(p):
    pc = p | ibs.Create([("a", 1), ("a", 2), ("b", 5)]) | ibs.Sql(
        "SELECT key, CAST(sum(value) AS BIGINT) AS value FROM PCOLLECTION GROUP BY key"
    )
    assert_that(pc, equal_to([("a", 3), ("b", 5)]))


def test_chained_transforms(p):
    composed = ibs.Map(lambda x: x + 1) | ibs.Filter(lambda x: x % 2 == 0)
    assert_that(p | ibs.Create([1, 2, 3]) | composed, equal_to([2, 4]))
