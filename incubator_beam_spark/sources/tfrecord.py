"""TFRecord IO (reference ``io/tfrecordio.py:233`` ReadFromTFRecord /
``:327`` WriteToTFRecord), implemented against the public TFRecord wire
format (TensorFlow's record spec):

    uint64 length | uint32 masked_crc32c(length) | data | uint32
    masked_crc32c(data)

with CRC32C (Castagnoli) masked as ``((crc >> 15 | crc << 17) +
0xa282ead8) & 0xffffffff``.

Spark-first shape:
- Read: ``binaryFile`` source lists + reads files in parallel (one task
  per file), records parsed per file with a generator — TFRecord has no
  block index, so a file is the unit of parallelism, exactly as in the
  reference's non-splittable TFRecordIO.
- Write: one shard per partition via ``mapInPandas`` (executor-side
  file IO). Paths are local/NFS here; a cluster deployment points the
  same writer at a mounted DFS path or swaps in the spark-tfrecord
  connector — the record encoder below is the format-defining part.

No TensorFlow dependency: records are opaque ``bytes`` elements (the
reference treats them the same way; Example parsing is the user's map).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# -- CRC32C (Castagnoli), table-driven, pure python --------------------------

_CRC_TABLE: list[int] = []


def _crc_table() -> list[int]:
    if not _CRC_TABLE:
        poly = 0x82F63B78  # reversed Castagnoli polynomial
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def encode_record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return b"".join(
        [
            header,
            struct.pack("<I", _masked_crc(header)),
            data,
            struct.pack("<I", _masked_crc(data)),
        ]
    )


def decode_records(blob: bytes, verify: bool = True):
    """Yield record payloads from one TFRecord file's bytes."""
    pos, n = 0, len(blob)
    while pos < n:
        (length,) = struct.unpack_from("<Q", blob, pos)
        header = blob[pos : pos + 8]
        (len_crc,) = struct.unpack_from("<I", blob, pos + 8)
        data = blob[pos + 12 : pos + 12 + length]
        (data_crc,) = struct.unpack_from("<I", blob, pos + 12 + length)
        if verify:
            if _masked_crc(header) != len_crc:
                raise IOError(f"corrupt TFRecord length crc at offset {pos}")
            if _masked_crc(data) != data_crc:
                raise IOError(f"corrupt TFRecord data crc at offset {pos}")
        yield data
        pos += 16 + length


# -- Spark surface -----------------------------------------------------------


def read_tfrecord(spark: SparkSession, path: str, verify: bool = True) -> DataFrame:
    """Read .tfrecord files into an ``element: binary`` DataFrame.
    Parallelism = one task per file (the format is not block-splittable
    without an index — same constraint as the reference's TFRecordIO)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                recs = list(decode_records(bytes(blob), verify))
                if recs:
                    yield pd.DataFrame({"element": recs})

    schema = T.StructType([T.StructField("element", T.BinaryType())])
    return files.select("content").mapInPandas(parse, schema)


def write_tfrecord(df: DataFrame, path: str, column: str = "element") -> int:
    """Write a binary column as TFRecord shards, one per partition,
    executor-side. Returns the number of records written."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    schema = T.StructType([T.StructField("n", T.LongType())])

    def write_shard(batches):
        import uuid

        shard = os.path.join(path, f"part-{uuid.uuid4().hex}.tfrecord")
        n = 0
        buf = []
        for pdf in batches:
            for rec in pdf[column]:
                buf.append(encode_record(bytes(rec)))
                n += 1
        if buf:
            with open(shard, "wb") as f:
                f.write(b"".join(buf))
        yield pd.DataFrame({"n": [n]})

    counts = df.select(F.col(column)).mapInPandas(write_shard, schema)
    return int(counts.agg(F.sum("n")).collect()[0][0] or 0)
