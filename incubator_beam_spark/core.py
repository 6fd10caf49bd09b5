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
    "CombineValues",
    "CombineGlobally",
    "CombineFn",
    "TaggedOutput",
    "DoOutputsTuple",
    "Flatten",
    "Partition",
    "Distinct",
    "Keys",
    "Values",
    "KvSwap",
    "WithKeys",
    "Reshuffle",
    "GroupBy",
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
        # Restore any Arrow batch cap a BatchElements in this pipeline set
        # (transforms.py BatchElements.expand records the prior value).
        if hasattr(self, "_arrow_cap_restore"):
            key = "spark.sql.execution.arrow.maxRecordsPerBatch"
            prev = self._arrow_cap_restore
            del self._arrow_cap_restore
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)
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


_PY_TO_SPARK = {
    int: "bigint",
    float: "double",
    str: "string",
    bool: "boolean",
    bytes: "binary",
}


def _schema_from_hint(hint) -> "Any | None":
    """Map a Python type hint to the element/kv column schema, or None if
    the hint isn't one we can translate (reference infers DoFn output
    types the same way via ``typehints/decorators.py``)."""
    import typing

    from pyspark.sql import types as T

    if hint in _PY_TO_SPARK:
        return T.StructType(
            [T.StructField("element", T._parse_datatype_string(_PY_TO_SPARK[hint]), True)]
        )
    origin = typing.get_origin(hint)
    args = typing.get_args(hint)
    if origin is tuple and len(args) == 2 and all(a in _PY_TO_SPARK for a in args):
        return T.StructType(
            [
                T.StructField("key", T._parse_datatype_string(_PY_TO_SPARK[args[0]]), True),
                T.StructField("value", T._parse_datatype_string(_PY_TO_SPARK[args[1]]), True),
            ]
        )
    return None


_EXC_TAG = "__exc__"


def _python_flatmap(
    df: DataFrame,
    fn: Callable[[Any], Iterable[Any]],
    spark: SparkSession,
    output_schema=None,
    dofn: "DoFn | None" = None,
    tag_field: str | None = None,
    sample_fn: Callable[[Any], Iterable[Any]] | None = None,
    error_field: str | None = None,
) -> DataFrame:
    """Run an arbitrary Python 1->N element function via Arrow-batched
    ``mapInPandas`` (the ParDo slow path; reference DoFn execution is
    row-at-a-time in ``runners/common.py:1148`` — we batch instead).

    Output schema resolution, in order (never silently drops data):
    1. explicit ``output_schema`` (a StructType, or a Python type like
       ``int`` / ``tuple[str, int]``) — no driver-side execution at all;
    2. a widening driver-side sample (20 -> 400 -> 8000 rows) until the
       fn produces at least one output element;
    3. the INPUT schema, assuming a type-preserving fn (true for Filter
       and most Maps). If the fn later emits a different type the Arrow
       cast fails loudly at runtime — loud beats the silent data loss of
       short-circuiting to an empty frame.

    ``dofn`` runs the documented lifecycle on the EXECUTOR (reference
    ``runners/common.py``): setup + start_bundle once per task (the Spark
    analog of a bundle), finish_bundle after the last batch. ``tag_field``
    is the multi-output path: fn yields ``(tag, value)`` and the output
    grows a leading string tag column.
    """
    import pandas as pd

    from pyspark.sql import types as T

    cols = list(df.columns)
    is_err = lambda o: (
        error_field is not None
        and isinstance(o, tuple)
        and len(o) == 2
        and o[0] == _EXC_TAG
    )
    strip = (lambda o: o[1]) if tag_field else (lambda o: o)
    schema = None
    if output_schema is not None:
        schema = (
            output_schema
            if isinstance(output_schema, T.StructType)
            else _schema_from_hint(output_schema)
        )
    if schema is None:
        probe = sample_fn or fn
        for n in (20, 400, 8000):
            sample = [_from_row(r, cols) for r in df.take(n)]
            out_sample = [
                o
                for o in itertools.chain.from_iterable(probe(e) for e in sample)
                if not is_err(o)
            ]
            if out_sample:
                out_rows, out_cols = _to_rows([strip(o) for o in out_sample])
                schema = spark.createDataFrame(out_rows, out_cols).schema
                break
            if len(sample) < n:  # exhausted the input; nothing to widen to
                break
    if schema is None:
        if cols not in (["element"], ["key", "value"]):
            raise ValueError(
                "cannot infer the output schema (the sample produced no "
                "elements); pass output_type= on the transform"
            )
        # assume type-preserving; runtime Arrow cast errors if it is not
        schema = df.schema
    if tag_field:
        schema = T.StructType(
            [T.StructField(tag_field, T.StringType(), False), *schema.fields]
        )
    if error_field:
        schema = T.StructType(
            [*schema.fields, T.StructField(error_field, T.StringType(), True)]
        )
    out_cols = [f.name for f in schema.fields]
    val_cols = [c for c in out_cols if c not in (tag_field, error_field)]

    def run(batches):
        if dofn is not None:
            dofn.setup()
            dofn.start_bundle()
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
                    if is_err(o):
                        row = {c: None for c in val_cols}
                        row[error_field] = o[1]
                        if tag_field:
                            row[tag_field] = None
                        out.append(row)
                        continue
                    v = strip(o)
                    if val_cols == ["key", "value"]:
                        row = {"key": v[0], "value": v[1]}
                    else:
                        row = {"element": v}
                    if tag_field:
                        row[tag_field] = o[0]
                    if error_field:
                        row[error_field] = None
                    out.append(row)
            yield pd.DataFrame(out, columns=out_cols) if out else pd.DataFrame(
                {c: [] for c in out_cols}
            )
        if dofn is not None:
            dofn.finish_bundle()

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
        vals = self.values
        n_tsv = sum(isinstance(v, TimestampedValue) for v in vals)
        if n_tsv and n_tsv != len(vals):
            raise ValueError(
                f"Create: {n_tsv} of {len(vals)} values are TimestampedValue — "
                "mix of timestamped and plain values is not allowed; wrap all "
                "elements in TimestampedValue or none"
            )
        if vals and n_tsv == len(vals):
            rows = [(v.value, v.timestamp) for v in vals]
            return PCollection(
                spark.createDataFrame(rows, ["element", "ts"]), pcoll.pipeline
            )
        rows, cols = _to_rows(vals)
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


def _expand_with_failures(pcoll: PCollection, gen, output_type, dofn=None, sample_gen=None):
    """Shared dead-letter expansion: run ``gen`` per element, catching
    exceptions into a JSON error column; split into (good, failures)."""
    import json

    def _wrap(g):
        def safe(e):
            try:
                yield from g(e)
            except Exception as ex:  # noqa: BLE001 - the whole point
                yield (
                    _EXC_TAG,
                    json.dumps(
                        {
                            "element": repr(e),
                            "error": str(ex),
                            "type": type(ex).__name__,
                        }
                    ),
                )

        return safe

    tagged = _python_flatmap(
        pcoll.df,
        _wrap(gen),
        pcoll.pipeline.spark,
        output_schema=output_type,
        dofn=dofn,
        sample_fn=_wrap(sample_gen) if sample_gen is not None else None,
        error_field="__error",
    ).persist()
    good = PCollection(
        tagged.filter(F.col("__error").isNull()).drop("__error"), pcoll.pipeline
    )
    bad = PCollection(
        tagged.filter(F.col("__error").isNotNull()).select(
            F.col("__error").alias("element")
        ),
        pcoll.pipeline,
    )
    return good, bad


class Map(PTransform):
    """1->1 element map (reference ``core.py:1535``). Column expressions run
    JVM-side; Python callables batch through Arrow. Extra args are side
    inputs (``pvalue.AsSingleton`` etc.) passed through to the callable."""

    def __init__(self, fn: Callable[..., Any] | Column, *side_inputs, output_type=None):
        self.fn = fn
        self.side_inputs = side_inputs
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> "PCollection | DoOutputsTuple":
        if isinstance(self.fn, Column):
            return PCollection(pcoll.df.select(self.fn.alias("element")), pcoll.pipeline)
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        if getattr(self, "_exception_handling", False):
            return _expand_with_failures(
                pcoll, lambda e: [fn(e, *sides)], self.output_type
            )
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda e: [fn(e, *sides)],
                pcoll.pipeline.spark,
                output_schema=self.output_type,
            ),
            pcoll.pipeline,
        )

    def with_output_types(self, hint) -> "Map":
        """Beam's ``.with_output_types`` (reference
        ``typehints/decorators.py``): skips driver-side schema sampling."""
        self.output_type = hint
        return self

    def with_exception_handling(self) -> "Map":
        """Dead-letter pattern: expansion returns a 2-tuple
        ``(good, failures)`` — failing elements short-circuit to the
        failures PCollection (one JSON string per failure: element repr,
        error message, exception type) instead of killing the job. The
        pipeline-survives-bad-records behavior production curation jobs
        need (same idea as the reader-level PERMISSIVE quarantine)."""
        self._exception_handling = True
        return self


class MapTuple(PTransform):
    """Unpack KV/tuple elements into fn args (reference ``core.py:1590``)."""

    def __init__(self, fn: Callable[..., Any], *side_inputs, output_type=None):
        self.fn = fn
        self.side_inputs = side_inputs
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda e: [fn(*e, *sides)],
                pcoll.pipeline.spark,
                output_schema=self.output_type,
            ),
            pcoll.pipeline,
        )


class FlatMap(PTransform):
    """1->N element map (reference ``core.py:1501``)."""

    def __init__(self, fn: Callable[..., Iterable[Any]], *side_inputs, output_type=None):
        self.fn = fn
        self.side_inputs = side_inputs
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda e: fn(e, *sides),
                pcoll.pipeline.spark,
                output_schema=self.output_type,
            ),
            pcoll.pipeline,
        )

    with_output_types = Map.with_output_types


class FlatMapTuple(PTransform):
    """reference ``core.py:1661``."""

    def __init__(self, fn: Callable[..., Iterable[Any]], *side_inputs, output_type=None):
        self.fn = fn
        self.side_inputs = side_inputs
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        fn, sides = self.fn, _resolve_sides(self.side_inputs)
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda e: fn(*e, *sides),
                pcoll.pipeline.spark,
                output_schema=self.output_type,
            ),
            pcoll.pipeline,
        )


class Filter(PTransform):
    """Keep elements where predicate holds (reference ``core.py:1736``).
    A Python predicate is 1:1 type-preserving, so the output schema IS the
    input schema — no driver-side sampling, no empty-sample hazard."""

    def __init__(self, fn: Callable[[Any], bool] | Column | str):
        self.fn = fn

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, (Column, str)):
            return PCollection(pcoll.df.filter(self.fn), pcoll.pipeline)
        fn = self.fn
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda e: [e] if fn(e) else [],
                pcoll.pipeline.spark,
                output_schema=pcoll.df.schema,
            ),
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


class TaggedOutput:
    """A value routed to a named output of a multi-output ParDo
    (reference ``pvalue.py:378`` ``TaggedOutput``)."""

    def __init__(self, tag: str, value):
        self.tag = tag
        self.value = value


class DoOutputsTuple:
    """Result of ``ParDo(...).with_outputs(...)`` (reference
    ``pvalue.py:221``): attribute / index access per tag."""

    def __init__(self, outputs: dict[str, PCollection], main_tag: str):
        self._outputs = outputs
        self._main_tag = main_tag

    def __getitem__(self, tag: str) -> PCollection:
        return self._outputs[tag]

    def __getattr__(self, tag: str) -> PCollection:
        try:
            return self._outputs[tag]
        except KeyError:
            raise AttributeError(tag) from None

    def __iter__(self):
        # main first, like the reference's DoOutputsTuple
        yield self._outputs[self._main_tag]
        for t, pc in self._outputs.items():
            if t != self._main_tag:
                yield pc


class ParDo(PTransform):
    """Apply a DoFn (reference ``core.py:1181``); extra args are side
    inputs passed to ``process``. ``setup``/``start_bundle``/
    ``finish_bundle`` run on the EXECUTOR, once per task (ADVICE round 1:
    driver-side setup broke non-picklable resources).

    ``with_outputs(*tags, main=...)`` enables tagged multi-output
    (reference ``core.py:1181`` / ``ParDoTest.java:375``): ``process``
    yields ``TaggedOutput(tag, value)`` for side outputs and plain values
    for the main output. All outputs must share one element shape
    (single value or KV pair); the tagged stream materializes once
    (persisted) and each tag is a filter over it.
    """

    def __init__(self, dofn: DoFn, *side_inputs, output_type=None):
        self.dofn = dofn
        self.side_inputs = side_inputs
        self.output_type = output_type
        self._tags: tuple[str, ...] | None = None
        self._main_tag = "main"

    def with_outputs(self, *tags: str, main: str = "main") -> "ParDo":
        self._tags = tags
        self._main_tag = main
        return self

    def with_exception_handling(self) -> "ParDo":
        """Dead-letter pattern (see Map.with_exception_handling);
        mutually exclusive with .with_outputs()."""
        self._exception_handling = True
        return self

    def with_output_types(self, hint) -> "ParDo":
        self.output_type = hint
        return self

    def expand(self, pcoll: PCollection) -> "PCollection | DoOutputsTuple":
        dofn = self.dofn
        sides = _resolve_sides(self.side_inputs)
        main_tag, tags = self._main_tag, self._tags

        def route(o):
            if isinstance(o, TaggedOutput):
                if tags is None:
                    raise ValueError(
                        "DoFn yielded TaggedOutput without .with_outputs()"
                    )
                return (o.tag, o.value)
            return (main_tag, o) if tags is not None else o

        def fn(e):
            for o in dofn.process(e, *sides):
                yield route(o)

        # schema sampling runs on a driver-side CLONE with its own
        # lifecycle, so the executor-bound dofn is pickled pristine
        _clone_cell: list = []

        def sample_fn(e):
            if not _clone_cell:
                from pyspark import cloudpickle

                c = cloudpickle.loads(cloudpickle.dumps(dofn))
                c.setup()
                c.start_bundle()
                _clone_cell.append(c)
            for o in _clone_cell[0].process(e, *sides):
                yield route(o)

        if tags is None:
            if getattr(self, "_exception_handling", False):
                return _expand_with_failures(
                    pcoll, fn, self.output_type, dofn=dofn, sample_gen=sample_fn
                )
            return PCollection(
                _python_flatmap(
                    pcoll.df,
                    fn,
                    pcoll.pipeline.spark,
                    output_schema=self.output_type,
                    dofn=dofn,
                    sample_fn=sample_fn,
                ),
                pcoll.pipeline,
            )

        if getattr(self, "_exception_handling", False):
            raise ValueError(
                "with_exception_handling() and with_outputs() are mutually exclusive"
            )
        tagged = _python_flatmap(
            pcoll.df,
            fn,
            pcoll.pipeline.spark,
            output_schema=self.output_type,
            dofn=dofn,
            tag_field="__tag",
            sample_fn=sample_fn,
        )
        # one pass computes every output; cache so N tag-filters don't
        # re-execute the DoFn N times
        tagged = tagged.persist()
        outputs = {
            t: PCollection(
                tagged.filter(F.col("__tag") == t).drop("__tag"), pcoll.pipeline
            )
            for t in (main_tag, *tags)
        }
        return DoOutputsTuple(outputs, main_tag)


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


class _CallableWrapFn:  # CombineFn from a plain reduce callable
    """Lift a plain ``list -> value`` callable into accumulator form: the
    accumulator is a bounded PENDING BUFFER that re-reduces whenever it
    grows past ``cap`` — so the shuffle carries O(cap) values per
    (partition, key), never the whole group (the unlifted collect_list
    shape round 1 was flagged for)."""

    def __init__(self, reduce_fn: Callable[[Iterable[Any]], Any], cap: int = 64):
        self.reduce_fn = reduce_fn
        self.cap = cap

    def create_accumulator(self):
        return []

    def add_input(self, acc, value):
        acc.append(value)
        if len(acc) > self.cap:
            return [self.reduce_fn(acc)]
        return acc

    def merge_accumulators(self, accs):
        merged = [v for a in accs for v in a]
        if len(merged) > self.cap:
            return [self.reduce_fn(merged)]
        return merged

    def extract_output(self, acc):
        return self.reduce_fn(acc) if len(acc) != 1 else acc[0]


class CombinePerKey(PTransform):
    """Associative combine per key (reference ``core.py:1979``). Named
    built-ins become native aggregates (Catalyst lifts to partial+final);
    CombineFns AND plain callables go through the lifted two-phase path
    (``combine_per_key_lifted``) — the shuffle carries accumulators, not
    elements, exactly like the reference's ``lift_combiners``
    (``translations.py:1093``). Plain callables must be re-reducible
    (associative on their own outputs), the same contract the reference
    imposes on CombineFn-from-callable."""

    def __init__(self, fn, output_type=None):
        self.fn = fn
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, str):
            agg = _BUILTIN_COMBINES[self.fn]("value").alias("value")
            return PCollection(pcoll.df.groupBy("key").agg(agg), pcoll.pipeline)
        combine_fn = self.fn if isinstance(self.fn, CombineFn) else _CallableWrapFn(self.fn)
        from pyspark.sql import types as T

        out_type = self.output_type
        if out_type is None:
            vt = pcoll.df.schema["value"].dataType
            out_type = vt if not isinstance(self.fn, CombineFn) else T.DoubleType()
        return PCollection(
            combine_per_key_lifted(
                pcoll.df, "key", "value", combine_fn, output_field="value",
                output_type=out_type,
            ),
            pcoll.pipeline,
        )


class CombineValues(PTransform):
    """Apply a combiner to each (key, iterable) AFTER a GroupByKey
    (reference ``core.py:2092``): the grouped array is already local, so
    this is a per-row ``aggregate``/Python reduce — no extra shuffle."""

    def __init__(self, fn: Callable[[Iterable[Any]], Any]):
        self.fn = fn

    def expand(self, pcoll: PCollection) -> PCollection:
        fn = self.fn
        if isinstance(fn, CombineFn):
            cf = fn

            def reduce_fn(vs):
                acc = cf.create_accumulator()
                for v in vs:
                    acc = cf.add_input(acc, v)
                return cf.extract_output(acc)
        else:
            reduce_fn = fn
        return PCollection(
            _python_flatmap(
                pcoll.df,
                lambda kv: [(kv[0], reduce_fn(list(kv[1])))],
                pcoll.pipeline.spark,
            ),
            pcoll.pipeline,
        )


class CombineGlobally(PTransform):
    """Whole-collection combine (reference ``core.py:1803``). Python
    combiners run lifted: map-side partial accumulators (one per task)
    shuffle to a single merge — never the elements themselves."""

    def __init__(self, fn, output_type=None):
        self.fn = fn
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        if isinstance(self.fn, str):
            agg = _BUILTIN_COMBINES[self.fn]("element").alias("element")
            return PCollection(pcoll.df.agg(agg), pcoll.pipeline)
        combine_fn = self.fn if isinstance(self.fn, CombineFn) else _CallableWrapFn(self.fn)
        from pyspark.sql import types as T

        out_type = self.output_type
        if out_type is None:
            vt = pcoll.df.schema["element"].dataType
            out_type = vt if not isinstance(self.fn, CombineFn) else T.DoubleType()
        keyed = pcoll.df.select(F.lit(0).alias("key"), F.col("element").alias("value"))
        lifted = combine_per_key_lifted(
            keyed, "key", "value", combine_fn, output_field="element",
            output_type=out_type,
        )
        return PCollection(lifted.select("element"), pcoll.pipeline)


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


class GroupBy(PTransform):
    """Fluent grouping facade (reference ``core.py:2386``;
    ``aggregate_field`` at ``core.py:2509``): Beam-shaped API over a
    native ``groupBy().agg()`` — Catalyst still plans one partial+final
    aggregation, the fluent chain just collects the field specs.

        pc | GroupBy('dept').aggregate_field('pay', sum, 'total_pay')
                            .aggregate_field('pay', max, 'top_pay')

    Grouping args are column names or ``name=Column`` computed keys;
    combiners are builtin callables (sum/min/max/len), aggregate name
    strings ('sum', 'mean', ...), or Column-producing callables.
    """

    _BUILTINS: dict[Any, Callable[[str], Column]] = {
        sum: F.sum,
        min: F.min,
        max: F.max,
        len: F.count,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "mean": F.avg,
        "any": F.any_value,
    }

    def __init__(self, *fields: str, **computed: Column):
        self.fields = fields
        self.computed = computed
        self._aggs: list[tuple[str, Any, str]] = []

    def aggregate_field(self, field: str, combiner, dest: str) -> "GroupBy":
        self._aggs.append((field, combiner, dest))
        return self

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        keys = list(self.fields)
        for name, expr in self.computed.items():
            df = df.withColumn(name, expr)
            keys.append(name)
        if not self._aggs:
            # bare GroupBy: per-key iterables of the remaining fields
            rest = [c for c in df.columns if c not in keys]
            out = df.groupBy(*keys).agg(
                F.sort_array(F.collect_list(F.struct(*rest))).alias("values")
            )
            return PCollection(out, pcoll.pipeline)
        cols = []
        for field, combiner, dest in self._aggs:
            agg = self._BUILTINS.get(combiner)
            if agg is not None:
                cols.append(agg(field).alias(dest))
            elif callable(combiner):  # Column-producing callable
                cols.append(combiner(F.col(field)).alias(dest))
            else:
                raise TypeError(f"unsupported combiner {combiner!r}")
        return PCollection(df.groupBy(*keys).agg(*cols), pcoll.pipeline)


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


class TimestampedValue:
    """reference ``transforms/window.py:221`` TimestampedValue: a value
    paired with an explicit event timestamp (epoch seconds). ``Create``
    materializes these as (element, ts) rows — the ``ts`` column is this
    engine's WindowedValue timestamp (SURVEY §1.3), so everything
    downstream (WindowInto, watermarks, timestamp combiners) just
    works."""

    __slots__ = ("value", "timestamp")

    def __init__(self, value: Any, timestamp: float):
        self.value = value
        self.timestamp = float(timestamp)

    def __repr__(self) -> str:  # pragma: no cover
        return f"TimestampedValue({self.value!r}, {self.timestamp})"


class ReshufflePerKey(PTransform):
    """reference ``transforms/util.py:652``: redistribution that
    PRESERVES keys' co-location — a hash repartition on the key column
    (Reshuffle redistributes round-robin; this one keeps each key on one
    partition so downstream per-key work is shuffle-free)."""

    def __init__(self, key_col: str = "key", num_partitions: int | None = None):
        self.key_col, self.n = key_col, num_partitions

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        df = (
            df.repartition(self.n, F.col(self.key_col))
            if self.n
            else df.repartition(F.col(self.key_col))
        )
        return PCollection(df, pcoll.pipeline)
