"""Stream sources (SURVEY §2 rows 1-2: `source-kinesis-media`,
`source-offset-resume`).

The reference opens a long-lived GetMedia HTTP stream and resumes via
the continuation token (/root/reference/parser.py:272-310). In Spark
that's a streaming source + checkpointed offset log: in production
`spark.readStream.format("kinesis")` (the connector owns resume); in
this offline harness, a file-stream replay of the `events` table. The
swap is one `format(...)` call — everything downstream is identical,
which is the point of declaring the pipeline logically.

Offset/resume semantics come for free: the checkpoint's offset log
records which files (≙ which shard positions) each micro-batch
consumed, replacing the hand-rolled token bookkeeping
(parser.py:292-303).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kinesis_stream(
    spark: SparkSession,
    *,
    stream_name: str,
    region: str,
    starting_position: str = "LATEST",
    endpoint_url: str | None = None,
) -> DataFrame:
    """Production source: the Spark Kinesis connector (the reference's
    GetMedia loop + continuation token, rows 1-2, collapsed into
    `format("aws-kinesis")` + the checkpoint offset log).

    `starting_position` LATEST == the reference's 'NOW' start selector
    (parser.py:292-303); resume-after-restart comes from the
    checkpoint, not an option. Requires the kinesis connector on the
    classpath (spark-sql-kinesis / Kinesis EFO connector) — not
    present in the offline harness, where events_stream() below is the
    drop-in stand-in.
    """
    reader = (
        spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.startingPosition", starting_position)
        .option("kinesis.consumerType", "GetRecords")
    )
    if endpoint_url:
        reader = reader.option("kinesis.endpointUrl", endpoint_url)
    return reader.load()


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream replay of events.parquet (the Kinesis stand-in).

    The timestamp handling mirrors io.load_table's type guard: a
    parquet TIMESTAMP(NANOS) file arrives as a nano-long (Spark 4
    rejects the physical type; the legacy conf reads it as long) and
    is converted with integer division; a micros file arrives as ntz
    and only needs the ltz cast. Session tz is UTC, so the cast is
    value-preserving either way.
    """
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        # file-stream source needs a directory; select just the events
        # file out of the sf dir
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    # ltz (not ntz) here: streaming watermarks/session windows operate
    # on TimestampType; batch oracle queries go through io.load_table.
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def table_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-stream replay of any fixture table (the generic form of
    `events_stream`, minus the nano-ts conversion `events` needs) —
    stands in for a continuous ingestion feed of that table."""
    schema = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", f"{table}.parquet")
        .load(sf_dir)
    )
