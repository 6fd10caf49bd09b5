"""Sources and sinks (IO connector matrix, SURVEY.md §2.10)."""

from .io import (  # noqa: F401
    ReadFromAvro,
    ReadFromBigQuery,
    ReadFromCsv,
    ReadFromJdbc,
    ReadFromJson,
    ReadFromKafka,
    ReadFromMongoDB,
    ReadFromParquet,
    ReadFromText,
    ReadFromTFRecord,
    WriteToAvro,
    WriteToBigQuery,
    WriteToCsv,
    WriteToFiles,
    WriteToJson,
    WriteToMongoDB,
    WriteToParquet,
    WriteToText,
    WriteToTFRecord,
)
