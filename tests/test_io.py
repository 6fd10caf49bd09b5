"""IO connector round-trips (reference test model: textio_test /
parquetio_test round-trip pattern)."""

from __future__ import annotations

import os

import pytest

import incubator_beam_spark.core as ibs
from incubator_beam_spark.sources import (
    ReadFromAvro,
    ReadFromCsv,
    ReadFromJson,
    ReadFromParquet,
    ReadFromText,
    WriteToCsv,
    WriteToJson,
    WriteToParquet,
    WriteToText,
)
from incubator_beam_spark.testing import assert_that, equal_to


@pytest.fixture(scope="module")
def p(spark):
    return ibs.Pipeline(spark)


def test_text_roundtrip(p, tmp_path):
    out = str(tmp_path / "txt")
    p | ibs.Create(["alpha", "beta", "gamma"]) | WriteToText(out)
    back = p | ReadFromText(out)
    assert_that(back, equal_to(["alpha", "beta", "gamma"]))


def test_parquet_roundtrip(p, tmp_path):
    out = str(tmp_path / "pq")
    p | ibs.Create([("a", 1), ("b", 2)]) | WriteToParquet(out)
    back = p | ReadFromParquet(out)
    assert_that(back, equal_to([("a", 1), ("b", 2)]))


def test_parquet_partitioned_write(p, tmp_path):
    out = str(tmp_path / "pq_dyn")
    p | ibs.Create([("a", 1), ("a", 2), ("b", 3)]) | WriteToParquet(
        out, partition_by=["key"]
    )
    # dynamic destinations: one dir per key (fileio WriteToFiles analog)
    assert sorted(d for d in os.listdir(out) if d.startswith("key=")) == ["key=a", "key=b"]
    back = p | ReadFromParquet(out)
    assert sorted((r.key, r.value) for r in back.df.collect()) == [
        ("a", 1), ("a", 2), ("b", 3),
    ]


def test_csv_roundtrip(p, tmp_path):
    out = str(tmp_path / "csv")
    p | ibs.Create([("x", 10), ("y", 20)]) | WriteToCsv(out)
    back = p | ReadFromCsv(out, schema="key string, value int")
    assert_that(back, equal_to([("x", 10), ("y", 20)]))


def test_json_roundtrip(p, tmp_path):
    out = str(tmp_path / "json")
    p | ibs.Create([("k1", 5)]) | WriteToJson(out)
    back = p | ReadFromJson(out, schema="key string, value long")
    assert_that(back, equal_to([("k1", 5)]))


def test_avro_gated(p, tmp_path):
    """Avro needs the spark-avro jar; absent here, the connector must fail
    with Spark's clear data-source error, not a crash elsewhere."""
    try:
        p | ibs.Create([("a", 1)]) | __import__(
            "incubator_beam_spark.sources", fromlist=["WriteToAvro"]
        ).WriteToAvro(str(tmp_path / "avro"))
        readable = True
    except Exception as e:  # noqa: BLE001
        readable = False
        assert "avro" in str(e).lower() or "FAILED_TO_LOAD" in str(e)
    if readable:  # jar present: verify the round-trip instead
        back = p | ReadFromAvro(str(tmp_path / "avro"))
        assert_that(back, equal_to([("a", 1)]))


def test_nexmark_q10_sharded_log_write(p, tmp_path):
    """NEXMark Q10 (log to sharded files — queries/Query10.java): events
    written partitioned by event date and sharded within each partition;
    reading back through the partition column round-trips and prunes."""
    import os

    from pyspark.sql import functions as F

    from incubator_beam_spark.catalog import table
    from .conftest import SF_DIR

    spark = p.spark if hasattr(p, "spark") else p
    e = table(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    out = str(tmp_path / "sharded_log")
    (e.repartition(4, "user_id")  # 4 shards per date partition
      .write.partitionBy("event_date").mode("overwrite").parquet(out))
    dates = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dates) >= 1
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # partition pruning: filtering one date reads only that directory
    one = dates[0].split("=", 1)[1]
    assert back.filter(F.col("event_date") == one).count() > 0


# -- round 2: TFRecord + dynamic destinations --------------------------------


def test_crc32c_known_vectors():
    from incubator_beam_spark.sources.tfrecord import crc32c

    # canonical CRC32C check value (RFC 3720 appendix / "123456789")
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_tfrecord_roundtrip(spark, tmp_path):
    from incubator_beam_spark.sources.tfrecord import read_tfrecord, write_tfrecord

    payloads = [f"record-{i}".encode() for i in range(100)]
    df = spark.createDataFrame([(p,) for p in payloads], ["element"]).repartition(4)
    n = write_tfrecord(df, str(tmp_path / "tf"))
    assert n == 100
    import glob

    shards = glob.glob(str(tmp_path / "tf" / "*.tfrecord"))
    assert len(shards) >= 2  # one shard per non-empty partition
    back = read_tfrecord(spark, str(tmp_path / "tf"))
    got = sorted(bytes(r.element) for r in back.collect())
    assert got == sorted(payloads)


def test_tfrecord_corruption_detected(spark, tmp_path):
    import pytest

    from incubator_beam_spark.sources.tfrecord import decode_records, encode_record

    blob = bytearray(encode_record(b"hello world"))
    blob[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(IOError, match="corrupt"):
        list(decode_records(bytes(blob)))
    # verification off: record still parses (length framing intact)
    assert list(decode_records(bytes(blob), verify=False))[0] != b"hello world"


def test_write_to_files_dynamic_destinations(spark, tmp_path):
    from pyspark.sql import functions as F

    from incubator_beam_spark.sources import WriteToFiles

    p = ibs.Pipeline(spark)
    rows = [("a", 1), ("b", 2), ("a", 3), ("c", 4)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    pc = ibs.PCollection(df, p)
    pc | WriteToFiles(str(tmp_path / "out"), destination=F.col("grp"), dest_field="grp")
    import os

    dirs = sorted(
        d for d in os.listdir(tmp_path / "out") if d.startswith("grp=")
    )
    assert dirs == ["grp=a", "grp=b", "grp=c"]
    back = spark.read.parquet(str(tmp_path / "out"))
    assert sorted((r.grp, r.v) for r in back.collect()) == sorted(rows)


def test_match_files_and_read_matches(spark, tmp_path):
    from incubator_beam_spark.sources import MatchFiles, ReadMatches

    (tmp_path / "a.txt").write_bytes(b"hello")
    (tmp_path / "b.txt").write_bytes(b"world!!")
    meta = MatchFiles(str(tmp_path / "*.txt")).read(spark).collect()
    assert {(r.path.rsplit("/", 1)[-1], r.size_bytes) for r in meta} == {
        ("a.txt", 5),
        ("b.txt", 7),
    }
    # metadata-only: the content column must be pruned from the scan
    plan = (
        MatchFiles(str(tmp_path / "*.txt"))
        .read(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan.split("ReadSchema")[-1][:200]
    rows = ReadMatches(str(tmp_path / "*.txt")).read(spark).collect()
    assert {bytes(r.content) for r in rows} == {b"hello", b"world!!"}


def test_read_all_from_text(spark, tmp_path):
    import incubator_beam_spark.core as ibs
    from incubator_beam_spark.sources import ReadAllFromText

    (tmp_path / "x.txt").write_text("l1\nl2\n")
    (tmp_path / "y.txt").write_text("l3\n")
    p = ibs.Pipeline(spark)
    pc = p | ibs.Create([str(tmp_path / "x.txt"), str(tmp_path / "y.txt")])
    out = (pc | ReadAllFromText()).df.collect()
    assert sorted(r.element for r in out) == ["l1", "l2", "l3"]
    assert all(r.path.startswith("file:") for r in out)


def test_periodic_impulse_is_rate_stream(spark):
    from incubator_beam_spark.streaming.source import periodic_impulse

    df = periodic_impulse(spark, fire_interval_sec=0.5)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["ts", "value"]


def test_json_corrupt_record_quarantine(spark, tmp_path):
    from incubator_beam_spark.sources import ReadFromJson

    f = tmp_path / "docs.jsonl"
    f.write_text('{"id": 1, "t": "ok"}\n{broken!!\n{"id": 2, "t": "fine"}\n')
    schema = "id long, t string, _corrupt_record string"
    df = ReadFromJson(str(f), schema=schema).read(spark).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 1 and "{broken!!" in bad.collect()[0]._corrupt_record
    dropped = ReadFromJson(str(f), schema="id long, t string", mode="DROPMALFORMED").read(spark)
    assert dropped.count() == 2


def test_csv_malformed_modes(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    from incubator_beam_spark.sources import ReadFromCsv

    f = tmp_path / "d.csv"
    f.write_text("a,b\n1,x\n2,y,EXTRA,COLS\n3,z\n")
    schema = "a long, b string"
    dropped = ReadFromCsv(str(f), schema=schema, mode="DROPMALFORMED").read(spark)
    assert sorted(r.a for r in dropped.collect()) == [1, 3]
    with pytest.raises(Exception):
        ReadFromCsv(str(f), schema=schema, mode="FAILFAST").read(spark).collect()


def test_synthetic_bounded_deterministic_and_skewed(spark):
    from incubator_beam_spark.sources.synthetic import synthetic_bounded

    df = synthetic_bounded(
        spark, 10_000, num_keys=50, hot_key_fraction=0.5, num_hot_keys=1,
        key_size=12, value_size=40,
    )
    rows = df.collect()
    assert len(rows) == 10_000
    # hot key 0 draws ~50% of traffic; cold keys share the rest
    hot = sum(1 for r in rows if r.key_id == 0)
    assert 4500 < hot < 5500
    assert all(len(r.key) == 12 and len(r.value) == 40 for r in rows)
    # regeneration is byte-identical (pure function of id + seed)
    again = synthetic_bounded(
        spark, 10_000, num_keys=50, hot_key_fraction=0.5, num_hot_keys=1,
        key_size=12, value_size=40,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_synthetic_source_validation_and_ptransform(spark):
    import pytest

    import incubator_beam_spark.core as ibs
    from incubator_beam_spark.sources.synthetic import (
        SyntheticSource,
        synthetic_bounded,
        synthetic_unbounded,
    )

    with pytest.raises(ValueError):
        synthetic_bounded(spark, 10, hot_key_fraction=1.5)
    with pytest.raises(ValueError):
        synthetic_bounded(spark, 10, num_keys=5, num_hot_keys=5)
    stream = synthetic_unbounded(spark, rows_per_second=10)
    assert stream.isStreaming and "key_id" in stream.columns

    p = ibs.Pipeline(spark)
    out = p | SyntheticSource(100, num_keys=10)
    assert out.df.count() == 100


def test_python_datasource_stream_offsets_and_splits(spark):
    """The STREAMING Python data source (UnboundedSource/SDF analog,
    reference SyntheticUnboundedSource.java): latestOffset advances the
    id high-watermark by rowsPerBatch per micro-batch (capped at
    numRecords so the drain terminates), partitions(start, end) splits
    each batch 4 ways, and every row carries (batch*1000 + split) so
    the OFFSET LOG and the SPLIT PLAN are both oracle-checked against a
    DuckDB regeneration of the md5-derived records. Registry growth is
    frozen at +3 this round (VERDICT r6 item 1), so this runs as an
    exact-oracle pytest; the gate registers with the r8 window."""
    import uuid

    import duckdb
    from pyspark.sql import functions as F

    from incubator_beam_spark.sources.pydatasource import SyntheticPyDataSource
    from tests.conftest import assert_matches_oracle

    spark.dataSource.register(SyntheticPyDataSource)
    df = (
        spark.readStream.format("synthetic_py")
        .option("numRecords", 12_000)
        .option("numPartitions", 4)
        .option("rowsPerBatch", 3_000)
        .option("numKeys", 100)
        .option("hotKeyFraction", 0.2)
        .option("numHotKeys", 2)
        .option("seed", "pyds_s")
        .load()
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        spark.table(name)
        .groupBy("part", "key_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )
    oracle = """
    WITH ids AS (SELECT unnest(generate_series(0, 11999))::BIGINT AS id),
    keyed AS (
      SELECT id,
             (id // 3000) * 1000 + (id % 3000) // 750 AS part,
             ('0x' || substr(md5('pyds_s|k|' || CAST(id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 AS b
      FROM ids),
    recs AS (
      SELECT id, part,
             CASE WHEN b < 200000 THEN b % 2 ELSE 2 + (b % 98) END AS key_id
      FROM keyed)
    SELECT CAST(part AS INT) AS part, key_id, count(*) AS n,
           min(id) AS min_id, max(id) AS max_id
    FROM recs GROUP BY part, key_id
    """
    con = duckdb.connect()
    assert_matches_oracle(out, con, oracle, "io_python_datasource_stream")


def test_python_datasource_stream_replay_is_bit_identical():
    """The exactly-once contract Structured Streaming demands of a
    source (and the reason the reference's UnboundedSource carries
    checkpoint marks, ``io/iobase.py:1239``): re-reading a committed
    (start, end) offset range after a restart must regenerate the SAME
    rows. Drive the reader object directly — no Spark session needed:
    plan partitions for a batch twice and read each split twice; both
    the split plans and the concatenated Arrow batches must be
    bit-identical. Also pins that latestOffset is capped at numRecords
    (the drain-terminates guarantee the gate relies on)."""
    from incubator_beam_spark.sources.pydatasource import (
        SyntheticPyStreamReader,
    )

    opts = {
        "numrecords": "7000",
        "numpartitions": "4",
        "rowsperbatch": "3000",
        "numkeys": "100",
        "hotkeyfraction": "0.2",
        "numhotkeys": "2",
        "seed": "replay_s",
    }
    r1 = SyntheticPyStreamReader(opts)
    offs = [r1.initialOffset()]
    for _ in range(4):
        offs.append(r1.latestOffset())
    # capped: 3000 -> 6000 -> 7000 -> 7000 (the drain terminates)
    assert [o["id"] for o in offs] == [0, 3000, 6000, 7000, 7000]

    r2 = SyntheticPyStreamReader(opts)  # a fresh reader, as after restart
    for start, end in zip(offs, offs[1:]):
        p1 = r1.partitions(start, end)
        p2 = r2.partitions(start, end)
        assert [(p.index, p.start, p.end) for p in p1] == [
            (p.index, p.start, p.end) for p in p2
        ]
        for a, b in zip(p1, p2):
            ba = [rb.to_pydict() for rb in r1.read(a)]
            bb = [rb.to_pydict() for rb in r2.read(b)]
            assert ba == bb
            # replaying the SAME reader must also be stable
            assert ba == [rb.to_pydict() for rb in r1.read(a)]
