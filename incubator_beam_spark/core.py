"""Beam-style pipeline API on Spark DataFrames.

Re-expresses the reference's core model (reference:
``sdks/python/apache_beam/transforms/core.py``, ``pvalue.py``,
``pipeline.py``) Spark-first:

- ``PCollection`` wraps a ``DataFrame`` (reference ``pvalue.py:140``).
  Plain Python elements live in a single ``element`` column; KV pairs are
  ``key``/``value`` columns. Schema'd elements are ordinary wide rows.
- ``PTransform`` is a composable ``PCollection -> PValue`` (reference
  ``transforms/ptransform.py``); ``|`` applies, ``>>`` labels.
- ``Pipeline`` is a thin facade (reference ``pipeline.py:109``) — the real
  DAG is the Catalyst logical plan inside each DataFrame, so ``run()`` has
  nothing to schedule; sinks trigger actions directly.

Execution notes at scale: expression-path transforms (column exprs, SQL
snippets) stay inside whole-stage codegen; Python-callable paths go through
Arrow-batched ``mapInPandas`` — never row-at-a-time serialization. The
runner lifting Beam does for combiners
(``runners/portability/fn_api_runner/translations.py:1093``) is Catalyst's
partial aggregation here.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "Pipeline",
    "PCollection",
    "PTransform",
    "Create",
    "Map",
    "MapTuple",
    "FlatMap",
    "FlatMapTuple",
    "Filter",
    "ParDo",
    "DoFn",
    "GroupByKey",
    "CoGroupByKey",
    "CombinePerKey",
    "CombineGlobally",
    "Flatten",
    "Partition",
    "Distinct",
    "Keys",
    "Values",
    "KvSwap",
    "WithKeys",
    "Reshuffle",
    "Sql",
]


class PCollection:
    """A distributed multiset of elements — a DataFrame plus conventions."""

    def __init__(self, df: DataFrame, pipeline: "Pipeline"):
        self.df = df
        self.pipeline = pipeline

    def __or__(self, transform: "PTransform | tuple[str, PTransform]") -> Any:
        if isinstance(transform, tuple):  # ("Label", transform)
            transform = transform[1]
        return transform.expand(self)

    apply = __or__

    # -- conveniences -------------------------------------------------------
    def collect(self) -> list:
        """Materialize as plain Python elements (driver-side; tests only)."""
        cols = self.df.columns
        rows = self.df.collect()
        names = getattr(self, "_cogbk_names", None)
        if names:
            return [(r["key"], {n: list(r[n]) for n in names}) for r in rows]
        if cols == ["element"]:
            return [r.element for r in rows]
        if cols == ["key", "value"]:
            return [(r.key, r.value) for r in rows]
        return rows

    @property
    def schema(self):
        return self.df.schema


class PTransform:
    """Composable computation on PCollections (reference
    ``transforms/ptransform.py``)."""

    label: str | None = None

    def expand(self, pcoll: PCollection) -> Any:
        raise NotImplementedError

    def __rrshift__(self, label: str) -> "PTransform":
        self.label = label
        return self

    def __or__(self, other: "PTransform") -> "PTransform":
        first, second = self, other

        class _Chained(PTransform):
            def expand(self, pcoll):
                return second.expand(first.expand(pcoll))

        return _Chained()


class Pipeline:
    """Facade collecting a SparkSession; composes with ``|`` like the
    reference's ``Pipeline.apply`` (``pipeline.py:613``)."""

    def __init__(self, spark: SparkSession | None = None):
        from .session import get_spark

        self.spark = spark or get_spark()

    def __enter__(self) -> "Pipeline":
        return self

    def __exit__(self, *exc) -> None:
        # DataFrames are lazy; sinks (write/collect) already ran inline.
        return None

    def __or__(self, transform: PTransform) -> Any:
        return transform.expand(PCollection(self.spark.range(1).select(F.lit(0).alias("element")), self))

    apply = __or__


# ---------------------------------------------------------------------------
# helpers: element <-> row conventions
# ---------------------------------------------------------------------------


def _to_rows(values: Iterable[Any]) -> tuple[list, list[str]]:
    """Map Python elements onto the column conventions."""
    vals = list(values)
    if vals and all(isinstance(v, tuple) and len(v) == 2 for v in vals):
        return [(k, v) for k, v in vals], ["key", "value"]
    return [(v,) for v in vals], ["element"]


def _from_row(row, cols: list[str]):
    if cols == ["element"]:
        return row.element
    if cols == ["key", "value"]:
        return (row.key, row.value)
    return row


def _python_flatmap(df: DataFrame, fn: Callable[[Any], Iterable[Any]], spark: SparkSession) -> DataFrame:
    """Run an arbitrary Python 1->N element function via Arrow-batched
    ``mapInPandas`` (the ParDo slow path; reference DoFn execution is
    row-at-a-time in ``runners/common.py:1148`` — we batch instead).

    Output schema is inferred from a driver-side sample (the reference
    infers from typehints; sampling is the pragmatic analog).
    """
    import pandas as pd

    cols = list(df.columns)
    sample = [_from_row(r, cols) for r in df.take(20)]
    out_sample = list(itertools.chain.from_iterable(fn(e) for e in sample))
    if not out_sample:
        # keep input schema shape; empty result
        return df.limit(0)
    out_rows, out_cols = _to_rows(out_sample)
    schema = spark.createDataFrame(out_rows, out_cols).schema

    def run(batches):
        for pdf in batches:
            out = []
            for t in pdf.itertuples(index=False):
                if cols == ["element"]:
                    elem = t.element
                elif cols == ["key", "value"]:
                    elem = (t.key, t.value)
                else:
                    elem = t
                for o in fn(elem):
                    if out_cols == ["key", "value"]:
                        out.append({"key": o[0], "value": o[1]})
                    else:
                        out.append({"element": o})
            yield pd.DataFrame(out, columns=out_cols) if out else pd.DataFrame(
                {c: [] for c in out_cols}
            )

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


class Create(PTransform):
    """Materialize in-memory values (reference ``core.py:2903``)."""

    def __init__(self, values: Iterable[Any]):
        self.values = list(values)

    def expand(self, pcoll: PCollection) -> PCollection:
        spark = pcoll.pipeline.spark
        rows, cols = _to_rows(self.values)
        return PCollection(spark.createDataFrame(rows, cols), pcoll.pipeline)


# ---------------------------------------------------------------------------
# element-wise
# ---------------------------------------------------------------------------


def _resolve_sides(side_inputs: tuple) -> tuple:
    """Side-input views (pvalue.AsSingleton/AsDict/...) resolve to plain
    values at expansion time; already-plain values pass through (matches
    the reference: views are windowed broadcasts, here driver broadcasts)."""
    from .pvalue import _View

    return tuple(s.resolve() if isinstance(s, _View) else s for s in side_inputs)


class Map(PTransform):
    """1->1 element map (reference ``core.py:1535``). Column expressions run
    JVM-side; Python callables batch through Arrow. Extra args are side
    inputs (``pvalue.AsSingleton`` etc.) passed through to the callable."""

    def __init__(self, fn: Callable[..., Any] | Column, *side_inputs):
        self.fn = fn
        self.side_inputs = side_inputs

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, Column):
            return PCollection(pcoll.df.select(self.fn.alias("element")), pcoll.pipeline)
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(pcoll.df, lambda e: [fn(e, *sides)], pcoll.pipeline.spark),
            pcoll.pipeline,
        )


class MapTuple(PTransform):
    """Unpack KV/tuple elements into fn args (reference ``core.py:1590``)."""

    def __init__(self, fn: Callable[..., Any], *side_inputs):
        self.fn = fn
        self.side_inputs = side_inputs

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(pcoll.df, lambda e: [fn(*e, *sides)], pcoll.pipeline.spark),
            pcoll.pipeline,
        )


class FlatMap(PTransform):
    """1->N element map (reference ``core.py:1501``)."""

    def __init__(self, fn: Callable[..., Iterable[Any]], *side_inputs):
        self.fn = fn
        self.side_inputs = side_inputs

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(pcoll.df, lambda e: fn(e, *sides), pcoll.pipeline.spark),
            pcoll.pipeline,
        )


class FlatMapTuple(PTransform):
    """reference ``core.py:1661``."""

    def __init__(self, fn: Callable[..., Iterable[Any]], *side_inputs):
        self.fn = fn
        self.side_inputs = side_inputs

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(pcoll.df, lambda e: fn(*e, *sides), pcoll.pipeline.spark),
            pcoll.pipeline,
        )


class Filter(PTransform):
    """Keep elements where predicate holds (reference ``core.py:1736``)."""

    def __init__(self, fn: Callable[[Any], bool] | Column | str):
        self.fn = fn

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, (Column, str)):
            return PCollection(pcoll.df.filter(self.fn), pcoll.pipeline)
        fn = self.fn
        return PCollection(
            _python_flatmap(pcoll.df, lambda e: [e] if fn(e) else [], pcoll.pipeline.spark),
            pcoll.pipeline,
        )


class DoFn:
    """Per-element processing with lifecycle (reference ``core.py:519``).

    ``setup/start_bundle`` map to once-per-Arrow-batch hooks;
    ``process(element)`` yields outputs."""

    def setup(self) -> None:  # pragma: no cover - trivial
        pass

    def start_bundle(self) -> None:  # pragma: no cover - trivial
        pass

    def process(self, element) -> Iterable[Any]:
        raise NotImplementedError

    def finish_bundle(self) -> None:  # pragma: no cover - trivial
        pass


class ParDo(PTransform):
    """Apply a DoFn (reference ``core.py:1181``); extra args are side
    inputs passed to ``process``."""

    def __init__(self, dofn: DoFn, *side_inputs):
        self.dofn = dofn
        self.side_inputs = side_inputs

    def expand(self, pcoll: PCollection) -> PCollection:
        dofn = self.dofn
        sides = _resolve_sides(self.side_inputs)
        dofn.setup()

        def fn(e):
            return list(dofn.process(e, *sides))

        return PCollection(
            _python_flatmap(pcoll.df, fn, pcoll.pipeline.spark), pcoll.pipeline
        )


# ---------------------------------------------------------------------------
# grouping / combining
# ---------------------------------------------------------------------------


class GroupByKey(PTransform):
    """KV -> (K, [V]) (reference ``core.py:2285``). The iterable is a Spark
    array column — for huge groups prefer CombinePerKey (never materializes
    the group) exactly as the reference recommends."""

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.groupBy("key").agg(F.collect_list("value").alias("value"))
        return PCollection(df, pcoll.pipeline)


class CoGroupByKey(PTransform):
    """n-way join-by-key (reference ``transforms/util.py:99``):
    ``CoGroupByKey(a=pc1, b=pc2)`` -> elements ``(key, {'a': [...], 'b':
    [...]})``. Implemented as per-side grouped arrays + full outer join —
    each side combines before the single shuffle."""

    def __init__(self, **named: PCollection):
        if len(named) < 2:
            raise ValueError("CoGroupByKey needs >= 2 named PCollections")
        self.named = named

    def expand(self, pcoll: PCollection) -> PCollection:
        items = list(self.named.items())
        joined = None
        for name, pc in items:
            side = pc.df.groupBy("key").agg(F.collect_list("value").alias(name))
            joined = side if joined is None else joined.join(side, "key", "full")
        names = [n for n, _ in items]
        empty_filled = joined.select(
            "key",
            *[F.coalesce(F.col(n), F.array()).alias(n) for n in names],
        )
        pipeline = next(iter(self.named.values())).pipeline
        # DataFrame carries key + one array column per side; collect() maps
        # rows to (key, {name: [values]}) via _cogbk_names
        out = PCollection(empty_filled, pipeline)
        out._cogbk_names = names
        return out


_BUILTIN_COMBINES: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    "count": F.count,
    "any": F.first,
}


class CombinePerKey(PTransform):
    """Associative combine per key (reference ``core.py:1979``). Named
    built-ins become native aggregates (Catalyst lifts to partial+final);
    Python callables reduce via ``aggregate`` over the grouped array."""

    def __init__(self, fn: str | Callable[[Iterable[Any]], Any]):
        self.fn = fn

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, str):
            agg = _BUILTIN_COMBINES[self.fn]("value").alias("value")
            return PCollection(pcoll.df.groupBy("key").agg(agg), pcoll.pipeline)
        fn = self.fn
        spark = pcoll.pipeline.spark
        grouped = pcoll.df.groupBy("key").agg(F.collect_list("value").alias("value"))
        return PCollection(
            _python_flatmap(
                grouped, lambda kv: [(kv[0], fn(kv[1]))], spark
            ),
            pcoll.pipeline,
        )


class CombineGlobally(PTransform):
    """Whole-collection combine (reference ``core.py:1803``)."""

    def __init__(self, fn: str | Callable[[Iterable[Any]], Any]):
        self.fn = fn

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, str):
            agg = _BUILTIN_COMBINES[self.fn]("element").alias("element")
            return PCollection(pcoll.df.agg(agg), pcoll.pipeline)
        fn = self.fn
        spark = pcoll.pipeline.spark
        grouped = pcoll.df.agg(F.collect_list("element").alias("element"))
        return PCollection(
            _python_flatmap(grouped, lambda es: [fn(es)], spark), pcoll.pipeline
        )


# ---------------------------------------------------------------------------
# structural
# ---------------------------------------------------------------------------


class Flatten(PTransform):
    """Union of N PCollections (reference ``core.py:2850``)."""

    def __init__(self, *others: PCollection):
        self.others = others

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for o in self.others:
            df = df.unionByName(o.df, allowMissingColumns=True)
        return PCollection(df, pcoll.pipeline)


class Partition(PTransform):
    """Split into n PCollections by fn (reference ``core.py:2586``).
    Catalyst shares the scan across the n filters."""

    def __init__(self, fn: Callable[[Any, int], int] | Column, n: int):
        self.fn, self.n = fn, n

    def expand(self, pcoll: PCollection) -> list[PCollection]:
        if isinstance(self.fn, Column):
            part = self.fn
            df = pcoll.df.withColumn("__part", part)
        else:
            fn, n = self.fn, self.n
            df = _python_flatmap(
                pcoll.df,
                lambda e: [((fn(e, n)), e)],
                pcoll.pipeline.spark,
            ).toDF("key", "value").withColumnRenamed("key", "__part").withColumnRenamed(
                "value", "element"
            )
            part = F.col("__part")
        return [
            PCollection(df.filter(F.col("__part") == i).drop("__part"), pcoll.pipeline)
            for i in range(self.n)
        ]


class Distinct(PTransform):
    """Dedup (reference ``transforms/util.py:249``)."""

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.distinct(), pcoll.pipeline)


class Keys(PTransform):
    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.select(F.col("key").alias("element")), pcoll.pipeline)


class Values(PTransform):
    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.select(F.col("value").alias("element")), pcoll.pipeline)


class KvSwap(PTransform):
    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(
            pcoll.df.select(
                F.col("value").alias("key"), F.col("key").alias("value")
            ),
            pcoll.pipeline,
        )


class WithKeys(PTransform):
    """Attach a key (reference ``transforms/util.py:760``)."""

    def __init__(self, key_fn: Callable[[Any], Any] | Column):
        self.key_fn = key_fn

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.key_fn, Column):
            df = pcoll.df.select(
                self.key_fn.alias("key"), F.col("element").alias("value")
            )
            return PCollection(df, pcoll.pipeline)
        fn = self.key_fn
        return PCollection(
            _python_flatmap(
                pcoll.df, lambda e: [(fn(e), e)], pcoll.pipeline.spark
            ),
            pcoll.pipeline,
        )


class Reshuffle(PTransform):
    """Redistribute (reference ``transforms/util.py:714``). Spark's shuffle
    is already a durability barrier; this is just repartition."""

    def __init__(self, num_partitions: int | None = None):
        self.n = num_partitions

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.repartition(self.n) if self.n else pcoll.df.repartition()
        return PCollection(df, pcoll.pipeline)


class Sql(PTransform):
    """SQL over the PCollection (reference ``SqlTransform.java:116``): the
    input registers as view ``PCOLLECTION`` and the query runs on Catalyst
    natively (no cross-language expansion service)."""

    def __init__(self, query: str):
        self.query = query

    def expand(self, pcoll: PCollection) -> PCollection:
        from .plans.sqlfront import run_sql

        pcoll.df.createOrReplaceTempView("PCOLLECTION")
        return PCollection(run_sql(pcoll.pipeline.spark, self.query), pcoll.pipeline)


class CombineFn:
    """Beam CombineFn (reference ``core.py:778``): create_accumulator /
    add_input / merge_accumulators / extract_output. Use with
    ``combine_per_key_lifted`` for runner-style combiner lifting."""

    def create_accumulator(self):
        raise NotImplementedError

    def add_input(self, acc, value):
        raise NotImplementedError

    def merge_accumulators(self, accs):
        raise NotImplementedError

    def extract_output(self, acc):
        return acc


def combine_per_key_lifted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    fn: CombineFn,
    output_field: str = "value",
    output_type=None,
):
    """CombinePerKey for arbitrary Python CombineFns WITH combiner
    lifting (reference ``translations.py:1093`` lift_combiners): phase 1
    folds inputs into per-(partition, key) accumulators inside
    ``mapInPandas`` — the map-side combine — so the shuffle carries one
    pickled accumulator per key per partition instead of every element;
    phase 2 merges accumulators per key and extracts output.

    This is what Catalyst's partial aggregation does for native
    aggregates, recreated for opaque Python combiners. Accumulator size
    must be O(1)-ish per key (same contract as Beam).
    """
    import pickle

    import pandas as pd
    from pyspark.sql import types as T

    output_type = output_type or T.DoubleType()
    key_field = df.schema[key_col]
    acc_schema = T.StructType(
        [key_field, T.StructField("__acc", T.BinaryType(), False)]
    )
    out_schema = T.StructType(
        [key_field, T.StructField(output_field, output_type, True)]
    )

    def partial(batches):
        accs: dict = {}
        for pdf in batches:
            for k, v in zip(pdf[key_col], pdf[value_col]):
                if k in accs:
                    accs[k] = fn.add_input(accs[k], v)
                else:
                    accs[k] = fn.add_input(fn.create_accumulator(), v)
        if accs:
            yield pd.DataFrame(
                {
                    key_col: list(accs.keys()),
                    "__acc": [pickle.dumps(a) for a in accs.values()],
                }
            )

    def merge(key, pdf):
        acc = fn.merge_accumulators([pickle.loads(b) for b in pdf["__acc"]])
        return pd.DataFrame({key_col: [key[0]], output_field: [fn.extract_output(acc)]})

    partials = df.select(key_col, value_col).mapInPandas(partial, acc_schema)
    return partials.groupBy(key_col).applyInPandas(merge, out_schema)
