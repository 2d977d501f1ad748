"""Custom Python DataSource (cwl_envelope): batch partition mapping,
decode parity with the declarative pipeline, and streaming offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.sources import python_datasource
from kinesis_logs_reader_spark.sources.envelope import typed_flow_logs

from tests.conftest import make_event


def test_batch_read_rows(spark, envelope_dir):
    python_datasource.register(spark)
    df = spark.read.format("cwl_envelope").option("path", envelope_dir).load()
    rows = sorted((dict(r["fields"]) for r in df.collect()), key=lambda d: sorted(d.items()))
    expected = sorted(
        (make_event(i)["extractedFields"] for i in range(5)), key=lambda d: sorted(d.items())
    )
    assert rows == expected


def test_shard_to_partition_mapping(spark, envelope_dir):
    """One shard directory -> one input partition (reference :61-66)."""
    python_datasource.register(spark)
    df = spark.read.format("cwl_envelope").option("path", envelope_dir).load()
    assert df.rdd.getNumPartitions() == 2  # shard0, shard1


def test_typed_cast_composes(spark, envelope_dir):
    python_datasource.register(spark)
    df = spark.read.format("cwl_envelope").option("path", envelope_dir).load()
    typed = typed_flow_logs(df)
    ports = sorted(r.srcport for r in typed.collect())
    assert ports == [1024, 1025, 1026, 1027, 1028]


def test_streaming_available_now(spark, envelope_dir, tmp_path):
    """Streaming reader drains all shards under availableNow and stops."""
    python_datasource.register(spark)
    stream = (
        spark.readStream.format("cwl_envelope").option("path", envelope_dir).load()
    )
    assert stream.isStreaming
    q = (
        stream.select(F.col("fields")["srcport"].cast("int").alias("srcport"))
        .writeStream.format("memory")
        .queryName("pyds_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.srcport for r in spark.table("pyds_sink").collect())
    assert got == [1024, 1025, 1026, 1027, 1028]
