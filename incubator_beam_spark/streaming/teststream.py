"""TestStream: scripted-time streaming test harness.

The reference's TestStream (``testing/test_stream.py:221``) scripts
element batches / watermark advances / processing-time jumps. Spark has no
programmatic push source in Python, so this harness drives a file-stream
source: each ``add_elements`` writes one parquet file into a staging dir
and each ``advance`` runs ``processAllAvailable`` — one scripted event
per micro-batch, fully deterministic.

Watermark advancement is implicit (Spark: max event time − delay); to
force windows closed, add a sentinel element with a far-future timestamp
(``advance_watermark_to_infinity``) and filter sentinels in assertions —
the same trick the reference's tests use with final watermark marks.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

SENTINEL_TYPE = "__watermark_sentinel__"


class TestStream:
    __test__ = False  # not a pytest class

    def __init__(self, spark: SparkSession, schema, checkpoint_dir: str | None = None):
        self.spark = spark
        self.schema = schema
        self.dir = tempfile.mkdtemp(prefix="teststream_")
        self._n = 0
        self._query = None
        self._sink_name = f"ts_{uuid.uuid4().hex[:8]}"

    @property
    def stream(self) -> DataFrame:
        return self.spark.readStream.schema(self.schema).parquet(self.dir)

    def start(self, transformed: DataFrame, output_mode: str = "append") -> "TestStream":
        self._query = (
            transformed.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(self._sink_name)
            .start()
        )
        return self

    def add_elements(self, rows: list) -> "TestStream":
        df = self.spark.createDataFrame(rows, self.schema)
        self._n += 1
        # the file source lists flat files; write to a scratch dir and move
        # the single part file into the staging dir
        scratch = os.path.join(self.dir, "_scratch")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = next(
            f for f in os.listdir(scratch) if f.startswith("part-") and f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(scratch, part),
            os.path.join(self.dir, f"batch_{self._n:05d}.parquet"),
        )
        shutil.rmtree(scratch, ignore_errors=True)
        return self

    def advance(self) -> "TestStream":
        """Process everything staged so far (one or more micro-batches)."""
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()
        return self

    def results(self) -> DataFrame:
        return self.spark.sql(f"SELECT * FROM {self._sink_name}")

    def stop(self) -> None:
        if self._query:
            self._query.stop()
        shutil.rmtree(self.dir, ignore_errors=True)

    def __enter__(self) -> "TestStream":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
