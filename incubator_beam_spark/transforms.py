"""Element-wise sugar + combiner library as Beam-named PTransforms
(SURVEY.md §2.2, §2.4).

Reference: ``transforms/combiners.py`` (Count/Mean/Top/Sample/ToList/
ToDict/ToSet/Latest), ``transforms/util.py`` (Regex, ToString,
GroupIntoBatches, Deduplicate batch shape), ``transforms/stats.py``
(ApproximateUnique/Quantiles), Java schema transforms
(``schemas/transforms/``: AddFields/DropFields/RenameFields/Select).

Everything lowers to native aggregates/expressions — these classes exist
so reference pipelines port by renaming imports only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import PCollection, PTransform

__all__ = [
    "Count",
    "Mean",
    "Top",
    "Sample",
    "ToList",
    "ToDict",
    "ToSet",
    "Latest",
    "ApproximateUnique",
    "ApproximateQuantiles",
    "Regex",
    "ToString",
    "GroupIntoBatches",
    "Deduplicate",
    "AddFields",
    "DropFields",
    "RenameFields",
    "SelectFields",
    "CastFields",
    "WithTimestamps",
    "LookupJoin",
    "Watch",
]


# -- combiners (reference combiners.py) -------------------------------------


class Count:
    class Globally(PTransform):
        """``combiners.py:119`` Count.Globally."""

        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.agg(F.count(F.lit(1)).alias("element")), pcoll.pipeline
            )

    class PerKey(PTransform):
        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.groupBy("key").agg(F.count(F.lit(1)).alias("value")),
                pcoll.pipeline,
            )

    class PerElement(PTransform):
        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.groupBy(F.col("element").alias("key")).agg(
                F.count(F.lit(1)).alias("value")
            )
            return PCollection(df, pcoll.pipeline)


class Mean:
    class Globally(PTransform):
        """``combiners.py:72``."""

        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(pcoll.df.agg(F.avg("element").alias("element")), pcoll.pipeline)

    class PerKey(PTransform):
        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.groupBy("key").agg(F.avg("value").alias("value")), pcoll.pipeline
            )


class Top:
    """``combiners.py:167`` — bounded top-k without a global sort."""

    class Largest(PTransform):
        def __init__(self, n: int):
            self.n = n

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.agg(
                F.slice(F.sort_array(F.collect_list("element"), asc=False), 1, self.n).alias(
                    "element"
                )
            )
            return PCollection(df, pcoll.pipeline)

    class Smallest(PTransform):
        def __init__(self, n: int):
            self.n = n

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.agg(
                F.slice(F.sort_array(F.collect_list("element")), 1, self.n).alias("element")
            )
            return PCollection(df, pcoll.pipeline)

    class PerKey(PTransform):
        def __init__(self, n: int, largest: bool = True):
            self.n, self.largest = n, largest

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.groupBy("key").agg(
                F.slice(
                    F.sort_array(F.collect_list("value"), asc=not self.largest), 1, self.n
                ).alias("value")
            )
            return PCollection(df, pcoll.pipeline)


class Sample:
    class FixedSizeGlobally(PTransform):
        """``combiners.py:522`` — uniform reservoir sample of n."""

        def __init__(self, n: int, seed: int = 42):
            self.n, self.seed = n, seed

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.orderBy(F.rand(self.seed)).limit(self.n)
            return PCollection(df, pcoll.pipeline)

    class FixedSizePerKey(PTransform):
        """``combiners.py:545`` — n uniform samples per key: one shuffle
        on the key, rank by per-row uniform rand inside each group (the
        distributed reservoir; no global sort)."""

        def __init__(self, n: int, seed: int = 42):
            self.n, self.seed = n, seed

        def expand(self, pcoll: PCollection) -> PCollection:
            from pyspark.sql import Window as W

            w = W.partitionBy("key").orderBy(F.rand(self.seed))
            df = (
                pcoll.df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= self.n)
                .drop("__rn")
            )
            return PCollection(df, pcoll.pipeline)


class ToList(PTransform):
    """``combiners.py:673`` — canonicalized (sorted) for determinism."""

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(
            pcoll.df.agg(F.sort_array(F.collect_list("element")).alias("element")),
            pcoll.pipeline,
        )


class ToDict(PTransform):
    """``combiners.py:701`` — KV pairs to one map element."""

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("key", "value")))
            ).alias("element")
        )
        return PCollection(df, pcoll.pipeline)


class ToSet(PTransform):
    """``combiners.py:738``."""

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(
            pcoll.df.agg(F.sort_array(F.collect_set("element")).alias("element")),
            pcoll.pipeline,
        )


class Latest:
    class PerKey(PTransform):
        """``combiners.py:842`` — value with max timestamp per key; input
        elements are (key, (value, ts))."""

        def __init__(self, ts_fn: Column | None = None):
            self.ts_fn = ts_fn

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.groupBy("key").agg(
                F.max_by(F.col("value._1"), F.col("value._2")).alias("value")
            )
            return PCollection(df, pcoll.pipeline)

    class Globally(PTransform):
        """``combiners.py:816`` Latest.Globally: the element with the max
        event time. Accepts either ``element``+``ts`` columns (the
        WithTimestamps shape) or ``key``/``value`` = (value, ts) pairs.
        Tie-break on (ts, value) so the result is deterministic —
        max_by(struct) is one partial-aggregated pass, no sort."""

        def expand(self, pcoll: PCollection) -> PCollection:
            cols = pcoll.df.columns
            if "ts" in cols and "element" in cols:
                val, ts = F.col("element"), F.col("ts")
            else:
                val, ts = F.col("key"), F.col("value")
            df = pcoll.df.agg(
                F.max_by(val, F.struct(ts, val)).alias("element")
            )
            return PCollection(df, pcoll.pipeline)


class ApproximateUnique:
    class Globally(PTransform):
        """``stats.py:90`` → HLL++ approx_count_distinct."""

        def __init__(self, rsd: float = 0.05):
            self.rsd = rsd

        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.agg(F.approx_count_distinct("element", self.rsd).alias("element")),
                pcoll.pipeline,
            )

    class PerKey(PTransform):
        """``stats.py:126`` — HLL++ per key (sketches merge map-side, the
        shuffle carries one sketch per key per partition)."""

        def __init__(self, rsd: float = 0.05):
            self.rsd = rsd

        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.groupBy("key").agg(
                    F.approx_count_distinct("value", self.rsd).alias("value")
                ),
                pcoll.pipeline,
            )


class ApproximateQuantiles:
    class Globally(PTransform):
        """``stats.py:284`` → percentile_approx."""

        def __init__(self, num_quantiles: int):
            self.num_quantiles = num_quantiles

        def expand(self, pcoll: PCollection) -> PCollection:
            probs = [i / (self.num_quantiles - 1) for i in range(self.num_quantiles)]
            return PCollection(
                pcoll.df.agg(
                    F.percentile_approx("element", probs, 10000).alias("element")
                ),
                pcoll.pipeline,
            )

    class PerKey(PTransform):
        """``stats.py:331`` — grouped percentile_approx (mergeable GK
        buffers, single shuffle)."""

        def __init__(self, num_quantiles: int):
            self.num_quantiles = num_quantiles

        def expand(self, pcoll: PCollection) -> PCollection:
            probs = [i / (self.num_quantiles - 1) for i in range(self.num_quantiles)]
            return PCollection(
                pcoll.df.groupBy("key").agg(
                    F.percentile_approx("value", probs, 10000).alias("value")
                ),
                pcoll.pipeline,
            )


# -- element-wise sugar (reference util.py) ---------------------------------


class Regex:
    """``transforms/util.py:1088`` — regex suite over string elements."""

    class Matches(PTransform):
        def __init__(self, pattern: str):
            self.pattern = pattern

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.filter(F.col("element").rlike(self.pattern))
            return PCollection(df, pcoll.pipeline)

    class FindAll(PTransform):
        def __init__(self, pattern: str):
            self.pattern = pattern

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.select(
                F.explode(
                    F.regexp_extract_all("element", F.lit(self.pattern), 0)
                ).alias("element")
            )
            return PCollection(df, pcoll.pipeline)

    class ReplaceAll(PTransform):
        def __init__(self, pattern: str, replacement: str):
            self.pattern, self.replacement = pattern, replacement

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.select(
                F.regexp_replace("element", self.pattern, self.replacement).alias("element")
            )
            return PCollection(df, pcoll.pipeline)

    class Split(PTransform):
        def __init__(self, pattern: str):
            self.pattern = pattern

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.select(
                F.explode(F.split("element", self.pattern)).alias("element")
            )
            return PCollection(df, pcoll.pipeline)


class ToString:
    """``transforms/util.py:999``."""

    class Element(PTransform):
        def expand(self, pcoll: PCollection) -> PCollection:
            return PCollection(
                pcoll.df.select(F.col("element").cast("string").alias("element")),
                pcoll.pipeline,
            )

    class Kvs(PTransform):
        def __init__(self, delimiter: str = ","):
            self.delimiter = delimiter

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.select(
                F.concat_ws(
                    self.delimiter, F.col("key").cast("string"), F.col("value").cast("string")
                ).alias("element")
            )
            return PCollection(df, pcoll.pipeline)

    class Iterables(PTransform):
        """``util.py:999`` ToString.Iterables: array elements join to one
        delimited string (codegen'd concat_ws, no UDF)."""

        def __init__(self, delimiter: str = ","):
            self.delimiter = delimiter

        def expand(self, pcoll: PCollection) -> PCollection:
            df = pcoll.df.select(
                F.concat_ws(
                    self.delimiter,
                    F.transform(F.col("element"), lambda x: x.cast("string")),
                ).alias("element")
            )
            return PCollection(df, pcoll.pipeline)


class GroupIntoBatches(PTransform):
    """Batch shape of ``util.py:787``: per-key arrays of <= n elements
    (deterministic chunking by sorted order; streaming shape lives in
    streaming/stateful.py)."""

    def __init__(self, batch_size: int):
        self.n = batch_size

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window as W

        w = W.partitionBy("key").orderBy("value")
        df = (
            pcoll.df.withColumn(
                "__batch", ((F.row_number().over(w) - 1) / self.n).cast("long")
            )
            .groupBy("key", "__batch")
            .agg(F.sort_array(F.collect_list("value")).alias("value"))
            .drop("__batch")
        )
        return PCollection(df, pcoll.pipeline)


class Deduplicate(PTransform):
    """Batch shape of ``transforms/deduplicate.py:111`` (the time-bounded
    streaming variant is streaming/stateful.deduplicate_stream)."""

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.distinct(), pcoll.pipeline)


class WithTimestamps(PTransform):
    """beam.window.TimestampedValue analog: attach/derive the event-time
    column (reference ``transforms/window.py`` TimestampedValue)."""

    def __init__(self, ts_expr: Column):
        self.ts_expr = ts_expr

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.withColumn("ts", self.ts_expr), pcoll.pipeline)


# -- schema field surgery (reference sdks/java/core/.../schemas/transforms/) -


class AddFields(PTransform):
    def __init__(self, **fields: Column):
        self.fields = fields

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for name, expr in self.fields.items():
            df = df.withColumn(name, expr)
        return PCollection(df, pcoll.pipeline)


class DropFields(PTransform):
    def __init__(self, *names: str):
        self.names = names

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.drop(*self.names), pcoll.pipeline)


class RenameFields(PTransform):
    def __init__(self, **renames: str):
        self.renames = renames  # old -> new

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for old, new in self.renames.items():
            df = df.withColumnRenamed(old, new)
        return PCollection(df, pcoll.pipeline)


class SelectFields(PTransform):
    def __init__(self, *names: str):
        self.names = names

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(pcoll.df.select(*self.names), pcoll.pipeline)


class CastFields(PTransform):
    """Schema ``Cast`` (reference ``schemas/transforms/Cast.java``):
    widen/narrow named fields to new Spark SQL types. ``strict=True``
    refuses lossy narrowing (Cast.widening semantics)."""

    _WIDENING = {
        "tinyint": {"smallint", "int", "bigint", "float", "double", "string"},
        "smallint": {"int", "bigint", "float", "double", "string"},
        "int": {"bigint", "double", "string"},
        "bigint": {"string"},
        "float": {"double", "string"},
        "double": {"string"},
    }

    def __init__(self, strict: bool = False, **casts: str):
        self.casts = casts  # field -> spark sql type string
        self.strict = strict

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for name, dtype in self.casts.items():
            cur = df.schema[name].dataType.simpleString()
            if self.strict and dtype not in self._WIDENING.get(cur, {dtype}):
                raise TypeError(f"narrowing cast {name}: {cur} -> {dtype} (strict)")
            df = df.withColumn(name, F.col(name).cast(dtype))
        return PCollection(df, pcoll.pipeline)


class LookupJoin(PTransform):
    """Point-lookup join against a seekable table (reference
    ``BeamSideInputLookupJoinRel.java`` — Beam SQL plans this when one
    join side is an unbounded stream and the other a bounded, seekable
    table).

    Two shapes, both without shuffling the big side:
    - ``table=`` DataFrame: a broadcast hash join — every executor holds
      the hashed table, the probe is a per-row lookup (this IS the
      seekable-table plan on Spark; works batch and streaming).
    - ``lookup_fn=`` Python callable (key -> row dict or None): for
      external key-value services; called once per DISTINCT key per Arrow
      batch via mapInPandas, results joined back locally — the batched
      RPC pattern.
    """

    def __init__(
        self,
        table=None,
        lookup_fn: Callable[[Any], "dict | None"] | None = None,
        on: str = "key",
        how: str = "left",
    ):
        if (table is None) == (lookup_fn is None):
            raise ValueError("pass exactly one of table= or lookup_fn=")
        self.table, self.lookup_fn, self.on, self.how = table, lookup_fn, on, how

    def expand(self, pcoll: PCollection) -> PCollection:
        if self.table is not None:
            side = self.table.df if isinstance(self.table, PCollection) else self.table
            joined = pcoll.df.join(F.broadcast(side), self.on, self.how)
            return PCollection(joined, pcoll.pipeline)

        import pandas as pd
        from pyspark.sql import types as T

        fn, on = self.lookup_fn, self.on
        # probe one key to learn the value schema (service lookups return
        # plain dicts; schema must be declared before mapInPandas)
        first = pcoll.df.select(on).first()
        sample = fn(first[0]) if first else None
        if not sample:
            raise ValueError("lookup_fn returned nothing for the probe key")
        spark = pcoll.pipeline.spark
        val_schema = spark.createDataFrame([tuple(sample.values())], list(sample)).schema
        out_schema = T.StructType(list(pcoll.df.schema.fields) + list(val_schema.fields))
        in_cols = pcoll.df.columns
        val_cols = [f.name for f in val_schema.fields]

        def run(batches):
            cache: dict = {}
            for pdf in batches:
                for k in pdf[on].unique():  # batched: one call per distinct key
                    if k not in cache:
                        cache[k] = fn(k)
                looked = [cache.get(k) or {} for k in pdf[on]]
                out = pdf[in_cols].copy()
                for c in val_cols:
                    out[c] = [d.get(c) for d in looked]
                yield out

        return PCollection(pcoll.df.mapInPandas(run, out_schema), pcoll.pipeline)


class Watch(PTransform):
    """Watch.Growth (reference ``transforms/Watch.java``): poll a
    user-supplied function for a growing result set until a termination
    condition, emitting the union of everything seen.

    Batch semantics: polls run driver-side (polling IS control-plane
    work — the reference runs it in a splittable DoFn for liveness, not
    parallelism); each poll's results append to one PCollection. For
    continuous file-arrival watching use the streaming file source
    (``streaming/source.py``), which is Spark's native Watch for the
    filesystem case.
    """

    def __init__(
        self,
        poll_fn: Callable[[], list],
        max_polls: int = 10,
        stop_after_idle_polls: int = 2,
        interval: float = 0.0,
    ):
        self.poll_fn = poll_fn
        self.max_polls = max_polls
        self.stop_after_idle = stop_after_idle_polls
        self.interval = interval

    def expand(self, pcoll: PCollection) -> PCollection:
        import time

        from .core import Create

        seen: list = []
        known: set = set()
        idle = 0
        for _ in range(self.max_polls):
            new = [e for e in self.poll_fn() if e not in known]
            if new:
                seen.extend(new)
                known.update(new)
                idle = 0
            else:
                idle += 1
                if idle >= self.stop_after_idle:
                    break
            if self.interval:
                time.sleep(self.interval)
        return Create(seen).expand(pcoll)


class WaitOn(PTransform):
    """Wait.on (reference ``sdks/java/core/.../transforms/Wait.java``):
    process the main input only after the signal collection(s) are fully
    computed. Spark batch is driver-sequenced, so the barrier is an
    eager materialization of each signal before the main plan is
    returned (in Beam this also orders side effects, e.g. write-then-
    read; the same holds here because the signal's sinks have run)."""

    def __init__(self, *signals: PCollection):
        self.signals = signals

    def expand(self, pcoll: PCollection) -> PCollection:
        for s in self.signals:
            s.df.count()  # materialize: the barrier
        return pcoll


class BatchElements(PTransform):
    """reference ``transforms/util.py:559``: adaptive row->batch
    conversion. On this engine batching is STRUCTURAL — every Python
    boundary already receives Arrow record batches (mapInPandas), sized
    by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — so the
    transform is the identity on the dataflow; it exists so reference
    pipelines port verbatim. ``max_batch_size`` adjusts the Arrow batch
    cap when given (Spark has one Arrow batch-size conf per session, not
    per-operator); the previous value is recorded on the Pipeline and
    restored at ``with``-block exit, so the cap is scoped to this
    pipeline's executions — sinks/collects run inline inside the block.
    Outside a ``with`` block the change persists (a warning says so).
    ``min_batch_size`` is accepted for API parity but is a NO-OP: Arrow
    batching has no lower bound knob (tail batches are naturally
    smaller)."""

    ARROW_CAP_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def __init__(self, min_batch_size: int = 1, max_batch_size: int | None = None):
        # min_batch_size intentionally unused — see docstring.
        self.max_batch_size = max_batch_size

    def expand(self, pcoll: PCollection) -> PCollection:
        if self.max_batch_size:
            import warnings

            pipeline = pcoll.pipeline
            conf = pipeline.spark.conf
            key = self.ARROW_CAP_KEY
            if not hasattr(pipeline, "_arrow_cap_restore"):
                pipeline._arrow_cap_restore = conf.get(key, None)
                warnings.warn(
                    f"BatchElements sets {key}={self.max_batch_size}; restored "
                    "when the Pipeline `with` block exits (persists session-wide "
                    "if the Pipeline is not used as a context manager)",
                    stacklevel=3,
                )
            conf.set(key, str(self.max_batch_size))
        return pcoll
