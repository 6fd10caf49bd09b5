"""IO connectors as thin PTransform wrappers over Spark's DataSource V2.

Reference inventory (SURVEY.md §2.10): textio/avroio/parquetio
(``io/textio.py:510,583``, ``io/avroio.py:70,468``,
``io/parquetio.py:136,344``), Kafka/JDBC cross-language wrappers
(``io/kafka.py:103,200``, ``io/jdbc.py:210,123``), fileio dynamic
destinations (``io/fileio.py:451``).

The reference implements each connector on its source framework
(SDF/BoundedSource); here every one delegates to a Spark connector —
split planning, pushdown, and parallel writes come from DataSource V2.
Filesystem schemes (s3a://, hdfs://, abfss://) ride on the Hadoop FS layer
unchanged. Connectors whose jars/servers aren't in this environment
(Kafka, JDBC) are constructed lazily and raise a clear error only when
actually used without their backend.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import PCollection, PTransform


class _Read(PTransform):
    """Root transform: ignores its (impulse) input and reads a source."""

    def __init__(self, **options: Any):
        self.options = options

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def expand(self, pcoll: PCollection) -> PCollection:
        return PCollection(self.read(pcoll.pipeline.spark), pcoll.pipeline)


class ReadFromText(_Read):
    """Line-oriented text (reference ``io/textio.py:510``); one 'element'
    column like Beam's str elements."""

    def __init__(self, path: str):
        super().__init__(path=path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.text(self.options["path"]).withColumnRenamed("value", "element")


class ReadFromParquet(_Read):
    def __init__(self, path: str):
        super().__init__(path=path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.options["path"])


class ReadFromAvro(_Read):
    """Avro (reference ``io/avroio.py:70``); needs spark-avro on the
    classpath — checked lazily."""

    def __init__(self, path: str):
        super().__init__(path=path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("avro").load(self.options["path"])


class ReadFromCsv(_Read):
    """CSV with malformed-row policy: ``mode`` is PERMISSIVE (capture the
    raw bad line in ``_corrupt_record`` — add that column to the schema),
    DROPMALFORMED, or FAILFAST. At curation scale (web-scraped CSVs)
    PERMISSIVE + a corrupt-record sink is the standard quarantine
    pattern; a crashing pipeline loses the whole partition's work."""

    def __init__(
        self,
        path: str,
        header: bool = True,
        schema: str | None = None,
        mode: str = "PERMISSIVE",
    ):
        super().__init__(path=path, header=header, schema=schema, mode=mode)

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("header", str(self.options["header"]).lower())
        reader = reader.option("mode", self.options["mode"])
        if self.options["schema"]:
            reader = reader.schema(self.options["schema"])
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(self.options["path"])


class ReadFromJson(_Read):
    """JSON-lines with the same malformed-record policy as ReadFromCsv
    (``_corrupt_record`` capture under PERMISSIVE)."""

    def __init__(self, path: str, schema: str | None = None, mode: str = "PERMISSIVE"):
        super().__init__(path=path, schema=schema, mode=mode)

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("mode", self.options["mode"])
        if self.options["schema"]:
            reader = reader.schema(self.options["schema"])
        return reader.json(self.options["path"])


class ReadFromJdbc(_Read):
    """JDBC (reference ``io/jdbc.py:210``): partitioned parallel reads via
    (partition_column, num_partitions, bounds) exactly like production
    Spark deployments."""

    def __init__(self, url: str, table: str, **options: Any):
        super().__init__(url=url, table=table, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        return (
            spark.read.format("jdbc")
            .option("url", opts.pop("url"))
            .option("dbtable", opts.pop("table"))
            .options(**{k: str(v) for k, v in opts.items()})
            .load()
        )


class ReadFromKafka(_Read):
    """Kafka (reference ``io/kafka.py:103``): the canonical unbounded
    source; returns the standard key/value/topic/partition/offset schema."""

    def __init__(self, bootstrap_servers: str, topic: str, streaming: bool = True):
        super().__init__(bootstrap_servers=bootstrap_servers, topic=topic, streaming=streaming)

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream if self.options["streaming"] else spark.read
        return (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", self.options["bootstrap_servers"])
            .option("subscribe", self.options["topic"])
            .load()
        )


class _Write(PTransform):
    def __init__(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None):
        self.path, self.mode, self.partition_by = path, mode, partition_by

    def writer(self, df: DataFrame):
        w = df.write.mode(self.mode)
        if self.partition_by:
            # dynamic destinations (reference fileio WriteToFiles): one
            # directory per partition value, written in parallel
            w = w.partitionBy(*self.partition_by)
        return w

    def expand(self, pcoll: PCollection) -> PCollection:
        self.write(pcoll.df)
        return pcoll

    def write(self, df: DataFrame) -> None:
        raise NotImplementedError


class WriteToParquet(_Write):
    def write(self, df: DataFrame) -> None:
        self.writer(df).parquet(self.path)


class WriteToText(_Write):
    """reference ``io/textio.py:583``; elements stringified to one column."""

    def write(self, df: DataFrame) -> None:
        cols = df.columns
        out = df if cols == ["element"] else df.select(
            F.to_json(F.struct(*cols)).alias("element")
        )
        self.writer(out.select(F.col("element").cast("string"))).text(self.path)


class WriteToCsv(_Write):
    def write(self, df: DataFrame) -> None:
        self.writer(df).option("header", "true").csv(self.path)


class WriteToJson(_Write):
    def write(self, df: DataFrame) -> None:
        self.writer(df).json(self.path)


class WriteToAvro(_Write):
    def write(self, df: DataFrame) -> None:
        self.writer(df).format("avro").save(self.path)


class ReadFromMongoDB(_Read):
    """MongoDB (reference ``io/mongodbio.py:116``): delegates to the
    mongo-spark DSv2 connector (aggregation pushdown + split planning by
    the connector). Constructed lazily — raises only when used without
    the connector jar/server, like the Kafka/JDBC wrappers."""

    def __init__(self, uri: str, database: str, collection: str, **options: Any):
        super().__init__(uri=uri, database=database, collection=collection, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        return (
            spark.read.format("mongodb")
            .option("connection.uri", opts.pop("uri"))
            .option("database", opts.pop("database"))
            .option("collection", opts.pop("collection"))
            .options(**{k: str(v) for k, v in opts.items()})
            .load()
        )


class WriteToMongoDB(PTransform):
    """reference ``io/mongodbio.py:372`` WriteToMongoDB."""

    def __init__(self, uri: str, database: str, collection: str, mode: str = "append"):
        self.uri, self.database, self.collection, self.mode = uri, database, collection, mode

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.write.format("mongodb")
            .mode(self.mode)
            .option("connection.uri", self.uri)
            .option("database", self.database)
            .option("collection", self.collection)
            .save()
        )
        return pcoll


class ReadFromBigQuery(_Read):
    """BigQuery (reference ``io/gcp/bigquery.py`` ``ReadFromBigQuery``):
    delegates to the public spark-bigquery DSv2 connector (storage-API
    parallel reads, filter/column pushdown planned by the connector).
    ``query=`` uses the connector's views-materialization path; ``table=``
    reads directly. Constructed lazily — raises only when used without
    the connector jar, like the Kafka/JDBC/Mongo wrappers."""

    def __init__(self, table: str | None = None, query: str | None = None, **options: Any):
        if (table is None) == (query is None):
            raise ValueError("exactly one of table= or query= is required")
        super().__init__(table=table, query=query, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        table, query = opts.pop("table"), opts.pop("query")
        reader = spark.read.format("bigquery")
        if query is not None:
            reader = reader.option("query", query).option(
                "viewsEnabled", "true"
            )
        else:
            reader = reader.option("table", table)
        return reader.options(**{k: str(v) for k, v in opts.items()}).load()


class WriteToBigQuery(PTransform):
    """reference ``io/gcp/bigquery.py`` ``WriteToBigQuery``
    (WRITE_APPEND/WRITE_TRUNCATE map to append/overwrite save modes)."""

    def __init__(self, table: str, mode: str = "append", **options: Any):
        self.table, self.mode, self.options = table, mode, options

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.write.format("bigquery")
            .mode(self.mode)
            .option("table", self.table)
            .options(**{k: str(v) for k, v in self.options.items()})
            .save()
        )
        return pcoll


class ReadFromSnowflake(_Read):
    """Snowflake (reference ``io/snowflake.py:120`` ReadFromSnowflake):
    delegates to the public spark-snowflake DSv2 connector (pushdown +
    parallel unload planned by the connector) instead of the reference's
    CSV-staging-bucket round-trip — Spark reads Arrow result batches
    directly, no staging bucket needed. ``table=`` or ``query=``
    (exactly one), like the BigQuery wrapper. Constructed lazily —
    raises only when used without the connector jar/account."""

    def __init__(
        self,
        server_name: str,
        database: str,
        schema: str,
        table: str | None = None,
        query: str | None = None,
        warehouse: str | None = None,
        role: str | None = None,
        **options: Any,
    ):
        if (table is None) == (query is None):
            raise ValueError("exactly one of table= or query= is required")
        super().__init__(
            server_name=server_name, database=database, schema=schema,
            table=table, query=query, warehouse=warehouse, role=role, **options,
        )

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        reader = (
            spark.read.format("snowflake")
            .option("sfURL", opts.pop("server_name"))
            .option("sfDatabase", opts.pop("database"))
            .option("sfSchema", opts.pop("schema"))
        )
        table, query = opts.pop("table"), opts.pop("query")
        reader = reader.option("query", query) if query else reader.option("dbtable", table)
        for key, opt in (("warehouse", "sfWarehouse"), ("role", "sfRole")):
            if opts.get(key):
                reader = reader.option(opt, opts[key])
            opts.pop(key, None)
        return reader.options(**{k: str(v) for k, v in opts.items()}).load()


class WriteToSnowflake(PTransform):
    """reference ``io/snowflake.py:261`` WriteToSnowflake
    (CREATE_IF_NEEDED/APPEND map to save modes)."""

    def __init__(self, server_name: str, database: str, schema: str, table: str,
                 mode: str = "append", **options: Any):
        self.server_name, self.database, self.schema = server_name, database, schema
        self.table, self.mode, self.options = table, mode, options

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.write.format("snowflake")
            .mode(self.mode)
            .option("sfURL", self.server_name)
            .option("sfDatabase", self.database)
            .option("sfSchema", self.schema)
            .option("dbtable", self.table)
            .options(**{k: str(v) for k, v in self.options.items()})
            .save()
        )
        return pcoll


class ReadFromKinesis(_Read):
    """Kinesis (reference ``io/kinesis.py:130`` ReadDataFromKinesis):
    delegates to the public spark-sql-kinesis DSv2 streaming connector;
    shard discovery/checkpointing are the connector's job (the reference
    delegates the same way, to the Java KinesisIO via xlang). Returns the
    connector's data/partitionKey/sequenceNumber schema."""

    _POSITIONS = ("LATEST", "TRIM_HORIZON", "AT_TIMESTAMP")

    def __init__(
        self,
        stream_name: str,
        region: str,
        aws_access_key: str | None = None,
        aws_secret_key: str | None = None,
        initial_position_in_stream: str = "LATEST",
        **options: Any,
    ):
        if initial_position_in_stream not in self._POSITIONS:
            raise ValueError(
                f"initial_position_in_stream must be one of {self._POSITIONS}"
            )
        super().__init__(
            stream_name=stream_name, region=region,
            aws_access_key=aws_access_key, aws_secret_key=aws_secret_key,
            initial_position_in_stream=initial_position_in_stream, **options,
        )

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        reader = (
            spark.readStream.format("kinesis")
            .option("streamName", opts.pop("stream_name"))
            .option("region", opts.pop("region"))
            .option("startingPosition", opts.pop("initial_position_in_stream"))
        )
        ak, sk = opts.pop("aws_access_key"), opts.pop("aws_secret_key")
        if ak:
            reader = reader.option("awsAccessKeyId", ak).option("awsSecretKey", sk)
        return reader.options(**{k: str(v) for k, v in opts.items()}).load()


# Debezium CDC envelope: payload.op is c(reate)/u(pdate)/d(elete)/r(ead-
# snapshot); before/after carry the row images as JSON objects.
DEBEZIUM_ENVELOPE_SCHEMA = (
    "struct<payload: struct<op: string, ts_ms: bigint, "
    "before: string, after: string, "
    "source: struct<table: string, lsn: bigint>>>"
)


def parse_debezium_envelope(raw: Column) -> Column:
    """Parse a Debezium JSON change-event envelope (server-free, exactly
    testable): returns struct(op, ts_ms, before, after, table, lsn).
    before/after stay as JSON strings — callers apply ``from_json`` with
    their table schema (schema varies per captured table)."""
    env = F.from_json(raw.cast("string"), DEBEZIUM_ENVELOPE_SCHEMA)
    p = env["payload"]
    return F.struct(
        p["op"].alias("op"),
        p["ts_ms"].alias("ts_ms"),
        p["before"].alias("before"),
        p["after"].alias("after"),
        p["source"]["table"].alias("table"),
        p["source"]["lsn"].alias("lsn"),
    )


class ReadFromDebezium(_Read):
    """Debezium CDC (reference ``io/debezium.py`` ReadFromDebezium): the
    reference embeds a Debezium engine in an SDF; the Spark-native shape
    is the standard deployment one — Debezium Server/Connect publishes
    change events to Kafka, Spark readStream consumes the topic and
    parses the envelope (``parse_debezium_envelope``, which is tested
    byte-exactly without a server). Yields one row per change event:
    (op, ts_ms, before, after, table, lsn)."""

    def __init__(self, bootstrap_servers: str, topic: str, streaming: bool = True):
        super().__init__(
            bootstrap_servers=bootstrap_servers, topic=topic, streaming=streaming
        )

    def read(self, spark: SparkSession) -> DataFrame:
        raw = ReadFromKafka(
            self.options["bootstrap_servers"],
            self.options["topic"],
            streaming=self.options["streaming"],
        ).read(spark)
        return raw.select(
            parse_debezium_envelope(F.col("value")).alias("change")
        ).select("change.*")


class ReadFromTFRecord(_Read):
    """reference ``io/tfrecordio.py:233``; records become ``element``
    bytes (format details in ``sources/tfrecord.py``)."""

    def __init__(self, path: str, verify: bool = True):
        super().__init__(path=path, verify=verify)

    def read(self, spark: SparkSession) -> DataFrame:
        from .tfrecord import read_tfrecord

        return read_tfrecord(spark, self.options["path"], self.options["verify"])


class WriteToTFRecord(PTransform):
    """reference ``io/tfrecordio.py:327``; writes the ``element`` binary
    column as one TFRecord shard per partition."""

    def __init__(self, path: str, column: str = "element"):
        self.path, self.column = path, column

    def expand(self, pcoll: PCollection) -> PCollection:
        from .tfrecord import write_tfrecord

        write_tfrecord(pcoll.df, self.path, self.column)
        return pcoll


class WriteToFiles(PTransform):
    """General dynamic-destination file writes (reference
    ``io/fileio.py:451`` ``WriteToFiles``): each element's destination is
    computed by a Column expression; one directory per destination value,
    written in a single parallel pass (Spark's dynamic ``partitionBy`` —
    the executor opens one writer per destination per task, exactly the
    writer-pool model the reference implements by hand).

    ``file_naming='dest'`` mirrors the reference's destination-prefixed
    naming: output lands under ``<path>/<dest_field>=<value>/``; readers
    recover the destination via partition-column inference. ``format``
    picks the sink (parquet/csv/json/text — the reference's sink=
    parameter).
    """

    def __init__(
        self,
        path: str,
        destination: Column | str,
        format: str = "parquet",
        dest_field: str = "dest",
        mode: str = "overwrite",
    ):
        self.path = path
        self.destination = destination
        self.format = format
        self.dest_field = dest_field
        self.mode = mode

    def expand(self, pcoll: PCollection) -> PCollection:
        dest = (
            F.col(self.destination)
            if isinstance(self.destination, str)
            else self.destination
        )
        out = pcoll.df.withColumn(self.dest_field, dest)
        w = out.write.mode(self.mode).partitionBy(self.dest_field)
        if self.format == "parquet":
            w.parquet(self.path)
        elif self.format == "csv":
            w.option("header", "true").csv(self.path)
        elif self.format == "json":
            w.json(self.path)
        elif self.format == "text":
            cols = [c for c in out.columns if c != self.dest_field]
            txt = out.select(
                F.to_json(F.struct(*cols)).alias("value"), self.dest_field
            )
            txt.write.mode(self.mode).partitionBy(self.dest_field).text(self.path)
        else:
            raise ValueError(f"unsupported format {self.format!r}")
        return pcoll


class MatchFiles(_Read):
    """File matching (reference ``io/fileio.py:176`` ``MatchFiles``):
    glob pattern → one row per matched file with (path, size,
    modification time) metadata. Uses the ``binaryFile`` source with the
    content column PRUNED — Spark's binaryFile reader skips the byte
    payload when ``content`` is not selected, so matching a million
    files lists metadata only."""

    def __init__(self, pattern: str, recursive: bool = False):
        super().__init__(pattern=pattern, recursive=recursive)

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", str(self.options["recursive"]).lower())
            .load(self.options["pattern"])
            .select(
                F.col("path"),
                F.col("length").alias("size_bytes"),
                F.col("modificationTime").alias("last_updated"),
            )
        )


class ReadMatches(_Read):
    """reference ``io/fileio.py:303`` ``ReadMatches``: matched files as
    ``ReadableFile``-like rows — (path, size, content bytes)."""

    def __init__(self, pattern: str, recursive: bool = False):
        super().__init__(pattern=pattern, recursive=recursive)

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", str(self.options["recursive"]).lower())
            .load(self.options["pattern"])
            .select(
                F.col("path"),
                F.col("length").alias("size_bytes"),
                F.col("content"),
            )
        )


class ReadAllFromText(PTransform):
    """reference ``io/textio.py:443`` ``ReadAllFromText``: a PCollection
    of file patterns → lines of every matched file, tagged with source
    path. The pattern list is metadata (small by construction) and is
    collected driver-side to plan the scan — the reads themselves stay
    fully parallel across executors, one task per file split."""

    def __init__(self, column: str = "element"):
        self.column = column

    def expand(self, pcoll: PCollection) -> PCollection:
        patterns = [r[0] for r in pcoll.df.select(self.column).collect()]
        spark = pcoll.df.sparkSession
        df = (
            spark.read.text(patterns)
            .withColumn("path", F.input_file_name())
            .select(F.col("value").alias("element"), "path")
        )
        return PCollection(df, pcoll.pipeline)


class ReadFromElasticsearch(_Read):
    """Elasticsearch (reference ``sdks/java/io/elasticsearch`` — REST
    bulk/scroll based): delegates to the public elasticsearch-spark
    ("org.elasticsearch.spark.sql") DSv2 connector, which plans one
    input split per index shard and pushes filters as ES query DSL —
    strictly more parallel than the reference's scroll pagination.
    Constructed lazily; raises only when used without the connector jar
    and a live cluster."""

    def __init__(self, nodes: str, index: str, query: str | None = None, **options: Any):
        if not nodes or not index:
            raise ValueError("nodes and index are required")
        super().__init__(nodes=nodes, index=index, query=query, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        reader = (
            spark.read.format("org.elasticsearch.spark.sql")
            .option("es.nodes", opts.pop("nodes"))
        )
        index = opts.pop("index")
        query = opts.pop("query")
        if query:
            reader = reader.option("es.query", query)
        return reader.options(**{k: str(v) for k, v in opts.items()}).load(index)


class WriteToElasticsearch(PTransform):
    """reference ``sdks/java/io/elasticsearch`` write path (bulk API with
    id routing): ``id_field`` maps to ``es.mapping.id`` for idempotent
    upserts."""

    def __init__(self, nodes: str, index: str, id_field: str | None = None,
                 mode: str = "append", **options: Any):
        if not nodes or not index:
            raise ValueError("nodes and index are required")
        self.nodes, self.index, self.id_field = nodes, index, id_field
        self.mode, self.options = mode, options

    def expand(self, pcoll: PCollection) -> PCollection:
        w = (
            pcoll.df.write.format("org.elasticsearch.spark.sql")
            .mode(self.mode)
            .option("es.nodes", self.nodes)
        )
        if self.id_field:
            w = w.option("es.mapping.id", self.id_field)
        w.options(**{k: str(v) for k, v in self.options.items()}).save(self.index)
        return pcoll


class ReadFromCassandra(_Read):
    """Cassandra (reference ``sdks/java/io/cassandra`` CassandraIO, token
    -range split reads): delegates to the public spark-cassandra-connector
    ("org.apache.spark.sql.cassandra"), which plans one split per token
    range and pushes partition-key predicates server-side — the same
    split model the reference implements by hand over the thrift ring."""

    def __init__(self, keyspace: str, table: str, **options: Any):
        if not keyspace or not table:
            raise ValueError("keyspace and table are required")
        super().__init__(keyspace=keyspace, table=table, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        return (
            spark.read.format("org.apache.spark.sql.cassandra")
            .option("keyspace", opts.pop("keyspace"))
            .option("table", opts.pop("table"))
            .options(**{k: str(v) for k, v in opts.items()})
            .load()
        )


class WriteToCassandra(PTransform):
    """reference ``sdks/java/io/cassandra`` write path (async batched
    mutations; save modes map to upsert semantics)."""

    def __init__(self, keyspace: str, table: str, mode: str = "append", **options: Any):
        if not keyspace or not table:
            raise ValueError("keyspace and table are required")
        self.keyspace, self.table, self.mode, self.options = keyspace, table, mode, options

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.write.format("org.apache.spark.sql.cassandra")
            .mode(self.mode)
            .option("keyspace", self.keyspace)
            .option("table", self.table)
            .options(**{k: str(v) for k, v in self.options.items()})
            .save()
        )
        return pcoll


class ReadFromRedis(_Read):
    """Redis (reference ``sdks/java/io/redis`` RedisIO, SCAN-pattern
    reads): delegates to the public spark-redis connector
    ("org.apache.spark.sql.redis"), which scans hash keys in parallel
    per Redis-cluster slot range. ``key_pattern`` mirrors RedisIO's
    ``readKeyPatterns``."""

    def __init__(self, host: str, port: int = 6379, table: str | None = None,
                 key_pattern: str | None = None, **options: Any):
        if (table is None) == (key_pattern is None):
            raise ValueError("exactly one of table= or key_pattern= is required")
        super().__init__(host=host, port=port, table=table,
                         key_pattern=key_pattern, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        reader = (
            spark.read.format("org.apache.spark.sql.redis")
            .option("host", opts.pop("host"))
            .option("port", str(opts.pop("port")))
        )
        table, pattern = opts.pop("table"), opts.pop("key_pattern")
        reader = (
            reader.option("table", table) if table
            else reader.option("keys.pattern", pattern)
        )
        return reader.options(**{k: str(v) for k, v in opts.items()}).load()


class WriteToRedis(PTransform):
    """reference ``sdks/java/io/redis`` write path (pipelined SET/HSET;
    ``key_column`` names the column used as the Redis key)."""

    def __init__(self, host: str, table: str, key_column: str,
                 port: int = 6379, mode: str = "append", **options: Any):
        if not table or not key_column:
            raise ValueError("table and key_column are required")
        self.host, self.port, self.table = host, port, table
        self.key_column, self.mode, self.options = key_column, mode, options

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.write.format("org.apache.spark.sql.redis")
            .mode(self.mode)
            .option("host", self.host)
            .option("port", str(self.port))
            .option("table", self.table)
            .option("key.column", self.key_column)
            .options(**{k: str(v) for k, v in self.options.items()})
            .save()
        )
        return pcoll


class ReadFromPubSubLite(_Read):
    """Pub/Sub Lite (reference ``meta/provider/pubsublite`` SQL table
    provider + ``io/gcp/pubsublite``): delegates to Google's public
    ``pubsublite-spark-sql-streaming`` DSv2 connector — one input
    partition per Lite partition, offsets checkpointed by the engine.
    Classic (non-Lite) Pub/Sub remains a documented drop: it has no
    public Spark connector and its pull protocol has no stable
    per-partition offsets to checkpoint (Kafka is this engine's
    canonical broker)."""

    def __init__(self, subscription_path: str, **options: Any):
        # projects/<id>/locations/<loc>/subscriptions/<name>
        parts = subscription_path.split("/")
        if len(parts) != 6 or parts[0] != "projects" or parts[4] != "subscriptions":
            raise ValueError(
                "subscription_path must look like "
                "projects/<project>/locations/<location>/subscriptions/<name>"
            )
        super().__init__(subscription_path=subscription_path, **options)

    def read(self, spark: SparkSession) -> DataFrame:
        opts = dict(self.options)
        return (
            spark.readStream.format("pubsublite")
            .option("pubsublite.subscription", opts.pop("subscription_path"))
            .options(**{k: str(v) for k, v in opts.items()})
            .load()
        )


class WriteToPubSubLite(PTransform):
    """Write path of the public pubsublite-spark connector (streaming
    sink; ``data`` column carries the message payload)."""

    def __init__(self, topic_path: str, **options: Any):
        parts = topic_path.split("/")
        if len(parts) != 6 or parts[0] != "projects" or parts[4] != "topics":
            raise ValueError(
                "topic_path must look like "
                "projects/<project>/locations/<location>/topics/<name>"
            )
        self.topic_path, self.options = topic_path, options

    def expand(self, pcoll: PCollection) -> PCollection:
        (
            pcoll.df.writeStream.format("pubsublite")
            .option("pubsublite.topic", self.topic_path)
            .options(**{k: str(v) for k, v in self.options.items()})
            .start()
        )
        return pcoll
