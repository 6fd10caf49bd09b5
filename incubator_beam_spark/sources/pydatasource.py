"""Python DataSource V2: the Spark-native answer to BoundedSource.

The reference's custom-source framework — ``BoundedSource`` +
``RestrictionTracker`` / SDF (``sdks/python/apache_beam/io/iobase.py:107``,
``iobase.py:1239``) — exists so a source can DESCRIBE its work and let the
runner split it. Spark 4's Python Data Source API
(``pyspark.sql.datasource``) is the same contract in Catalyst terms:
``DataSourceReader.partitions()`` is ``BoundedSource.split`` (the planner
schedules one task per returned ``InputPartition``), ``read(partition)``
is the per-bundle reader, and the result enters the scan as Arrow batches.
This module backs the SDF "declared drop" (README ADR) with running code:
the synthetic bounded generator (``sources/synthetic.py`` semantics,
reference ``SyntheticBoundedSource.java``) re-implemented as a planned,
partition-parallel Python data source.

Records are md5-derived exactly like the Catalyst generator, so a DuckDB
oracle regenerates the stream bit-for-bit; each row also carries the
partition index that produced it, making the SPLIT PLAN itself part of
the oracle-checked result (partition i covers the contiguous id range
``[i*chunk, min((i+1)*chunk, n))``).

At 100 TB the shape holds: planning is O(num_partitions) on the driver,
generation is embarrassingly parallel per partition with no shuffle, and
rows leave Python as Arrow RecordBatches (one per ~8k ids), not
row-at-a-time pickles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _md5_int(text: str) -> int:
    """First 8 md5 hex chars as int — matches the Catalyst generator's
    ``conv(substring(md5(..), 1, 8), 16, 10)`` and DuckDB's
    ``('0x' || substr(md5(..), 1, 8))::BIGINT``."""
    return int(hashlib.md5(text.encode()).hexdigest()[:8], 16)


def _sized_hex(text: str, n_chars: int) -> str:
    h = hashlib.md5(text.encode()).hexdigest()
    reps = (n_chars + 31) // 32
    return (h * reps)[:n_chars]


class SyntheticRange(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index, self.start, self.end = index, start, end


class SyntheticPyReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numrecords", 10_000))
        self.parts = int(options.get("numpartitions", 8))
        self.key_size = int(options.get("keysize", 8))
        self.value_size = int(options.get("valuesize", 16))
        self.num_keys = int(options.get("numkeys", 100))
        self.hot_frac = float(options.get("hotkeyfraction", 0.0))
        self.num_hot = int(options.get("numhotkeys", 1))
        self.seed = options.get("seed", "syn")
        if self.num_hot >= self.num_keys:
            raise ValueError("numHotKeys must be < numKeys")

    def partitions(self):
        # the split plan: contiguous id ranges, one task each — the
        # moral equivalent of BoundedSource.split(desired_bundle_size)
        chunk = -(-self.n // self.parts)  # ceil
        return [
            SyntheticRange(i, i * chunk, min((i + 1) * chunk, self.n))
            for i in range(self.parts)
            if i * chunk < self.n
        ]

    def read(self, partition: SyntheticRange):
        import pyarrow as pa

        # Arrow schema must MATCH the declared Spark schema exactly —
        # from_pydict would infer int64 for "part" and the JVM-side
        # ArrowColumnVector accessor for IntegerType would then crash
        arrow_schema = pa.schema(
            [
                ("id", pa.int64()),
                ("part", pa.int32()),
                ("key_id", pa.int64()),
                ("key", pa.string()),
                ("value", pa.string()),
            ]
        )
        cold = self.num_keys - self.num_hot
        hot_cut = int(self.hot_frac * 1_000_000)
        key_cache: dict[int, str] = {}

        def batch(ids, parts, key_ids, keys, values):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(parts, pa.int32()),
                    pa.array(key_ids, pa.int64()),
                    pa.array(keys, pa.string()),
                    pa.array(values, pa.string()),
                ],
                schema=arrow_schema,
            )

        ids, parts, key_ids, keys, values = [], [], [], [], []
        for i in range(partition.start, partition.end):
            b = _md5_int(f"{self.seed}|k|{i}") % 1_000_000
            kid = b % self.num_hot if b < hot_cut else self.num_hot + (b % cold)
            key = key_cache.get(kid)
            if key is None:
                key = key_cache[kid] = _sized_hex(
                    f"{self.seed}|key|{kid}", self.key_size
                )
            ids.append(i)
            parts.append(partition.index)
            key_ids.append(kid)
            keys.append(key)
            values.append(_sized_hex(f"{self.seed}|val|{i}", self.value_size))
            if len(ids) >= 8192:
                yield batch(ids, parts, key_ids, keys, values)
                ids, parts, key_ids, keys, values = [], [], [], [], []
        if ids:
            yield batch(ids, parts, key_ids, keys, values)


class SyntheticPyStreamReader(DataSourceStreamReader):
    """The UnboundedSource analog (reference
    ``SyntheticUnboundedSource.java`` + ``iobase.py:1239`` SDF
    machinery), expressed in Spark's offset contract: ``latestOffset``
    advances the id high-watermark by ``rowsPerBatch`` per micro-batch
    (capped at ``numRecords`` so a drain TERMINATES deterministically),
    ``partitions(start, end)`` splits each batch's id range into
    ``numPartitions`` parallel planned splits, and a replayed
    ``(start, end)`` regenerates bit-identical rows — exactly the
    exactly-once replay guarantee Structured Streaming requires of a
    source (and the reason classic Pub/Sub stays dropped, README ADR).
    Rows carry the micro-batch index and partition index, so the offset
    LOG and the split plan are both oracle-checkable."""

    def __init__(self, options):
        self.inner = SyntheticPyReader(options)
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        # one state mutation per micro-batch, capped: the drain ends
        self._last = getattr(self, "_last", 0)
        self._last = min(self._last + self.rows_per_batch, self.inner.n)
        return {"id": self._last}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["id"], end["id"]
        n = hi - lo
        if n <= 0:
            return [SyntheticRange(0, lo, lo)]
        parts = self.inner.parts
        chunk = -(-n // parts)
        batch_index = lo // self.rows_per_batch
        return [
            SyntheticRange(
                batch_index * 1000 + i, lo + i * chunk, min(lo + (i + 1) * chunk, hi)
            )
            for i in range(parts)
            if lo + i * chunk < hi
        ]

    def read(self, partition: SyntheticRange):
        yield from self.inner.read(partition)

    def commit(self, end: dict) -> None:
        pass


class SyntheticPyDataSource(DataSource):
    """``spark.read.format("synthetic_py")`` (bounded, planned splits) or
    ``spark.readStream.format("synthetic_py")`` (offset-tracked
    micro-batches) after ``spark.dataSource.register``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_py"

    def schema(self) -> str:
        return "id bigint, part int, key_id bigint, key string, value string"

    def reader(self, schema) -> SyntheticPyReader:
        return SyntheticPyReader(self.options)

    def streamReader(self, schema) -> SyntheticPyStreamReader:
        return SyntheticPyStreamReader(self.options)
