"""Ingest-path tests: envelope decode, typing, CLI TSV, gzip round-trip.

Mirrors the reference suite (tests/test_kinesis_logs_reader.py):
order-insensitive row-set equality (:192-195), golden TSV header/rows
(:219-233), --count limit (:227-233), gunzip round-trip (:121-123).
"""

from __future__ import annotations

import io

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.cli import print_stream
from kinesis_logs_reader_spark.functions.gzip_udfs import gzip_compress, gunzip_text, gzip_blob, gunzip_blob
from kinesis_logs_reader_spark.reader import KinesisLogsReader
from kinesis_logs_reader_spark.sources.envelope import read_cwl_batch

from tests.conftest import make_event


def test_gunzip_roundtrip(spark):
    """gunzip(gzip(x)) == x — reference tests:121-123, as Spark columns."""
    payloads = [b"hello world", b"", b'{"k": 1}']
    df = spark.createDataFrame([(p,) for p in payloads], "raw binary")
    out = df.select(gunzip_blob(gzip_blob(F.col("raw"))).alias("rt")).collect()
    assert [bytes(r.rt) for r in out] == payloads


def test_golden_gunzip(spark):
    """Golden-bytes decompress (reference tests:112-119)."""
    blob = gzip_compress(b"flow log line")
    df = spark.createDataFrame([(blob,)], "data binary")
    [row] = df.select(gunzip_text(F.col("data")).alias("t")).collect()
    assert row.t == "flow log line"


def test_envelope_rows_match(spark, envelope_dir):
    """Order-insensitive row-set equality (reference tests:192-195):
    5 data events survive; the control message and empty page don't."""
    df = read_cwl_batch(spark, envelope_dir, typed=False)
    key = lambda d: sorted(d.items())
    rows = sorted((dict(r["fields"]) for r in df.collect()), key=key)
    expected = sorted((make_event(i)["extractedFields"] for i in range(5)), key=key)
    assert rows == expected


def test_envelope_typed_cast(spark, envelope_dir):
    """Dynamic map -> typed columns: ints are ints, missing fields null."""
    df = read_cwl_batch(spark, envelope_dir, typed=True)
    rows = {r.srcport: r for r in df.collect()}
    assert set(rows) == {1024, 1025, 1026, 1027, 1028}
    r = rows[1024]
    assert r.dstport == 443 and r.protocol == 6
    assert r.srcaddr == "192.0.2.0"
    assert r.bytes is None and r.action is None  # absent in 5-field variant


def test_cli_tsv_golden(spark, envelope_dir):
    """Golden TSV: sorted header then tab-joined rows (reference tests:219-225)."""
    reader = KinesisLogsReader(spark=spark, path=envelope_dir, typed=False)
    buf = io.StringIO()
    n = print_stream(reader, outfile=buf)
    lines = buf.getvalue().splitlines()
    assert n == 5 and len(lines) == 6
    assert lines[0] == "dstaddr\tdstport\tprotocol\tsrcaddr\tsrcport"
    assert "198.51.100.1\t443\t6\t192.0.2.0\t1024" in lines[1:]


def test_cli_count_limit(spark, envelope_dir):
    """--count honored (reference tests:227-233)."""
    reader = KinesisLogsReader(spark=spark, path=envelope_dir, typed=False)
    buf = io.StringIO()
    n = print_stream(reader, stop_after=2, outfile=buf)
    assert n == 2
    assert len(buf.getvalue().splitlines()) == 3


def test_start_time_positioned_read(spark, tmp_path):
    """AT_TIMESTAMP analog (reference kinesis_logs_reader.py:68-77):
    start_time prunes older blobs at file-listing time."""
    import os
    from datetime import datetime

    from tests.conftest import data_message, gz_blob

    src = tmp_path / "timed"
    src.mkdir()
    old = src / "old.gz"
    new = src / "new.gz"
    old.write_bytes(gz_blob(data_message([make_event(0)])))
    new.write_bytes(gz_blob(data_message([make_event(1)])))
    os.utime(old, (1600000000, 1600000000))  # 2020
    os.utime(new, (1700000000, 1700000000))  # 2023

    all_rows = read_cwl_batch(spark, str(src), typed=True)
    assert {r.srcport for r in all_rows.collect()} == {1024, 1025}

    positioned = read_cwl_batch(
        spark, str(src), typed=True, start_time=datetime(2022, 1, 1)
    )
    assert {r.srcport for r in positioned.collect()} == {1025}


def test_permissive_mode_drops_corrupt_records(spark, tmp_path):
    """PERMISSIVE ingest: corrupt gzip and malformed JSON vanish;
    valid records survive. Strict mode (reference semantics) fails."""
    import pytest

    from kinesis_logs_reader_spark.functions.gzip_udfs import gzip_compress
    from tests.conftest import data_message, gz_blob

    src = tmp_path / "dirty"
    src.mkdir()
    (src / "good.gz").write_bytes(gz_blob(data_message([make_event(1)])))
    (src / "corrupt.gz").write_bytes(b"\x1f\x8b\x08\x00BROKEN")
    (src / "notjson.gz").write_bytes(gzip_compress(b"this is not json"))

    ok = read_cwl_batch(spark, str(src), typed=False, mode="permissive")
    rows = [dict(r["fields"]) for r in ok.collect()]
    assert rows == [make_event(1)["extractedFields"]]

    strict = read_cwl_batch(spark, str(src), typed=False, mode="strict")
    with pytest.raises(Exception):
        strict.collect()


def test_streaming_ingest_available_now(spark, envelope_dir, tmp_path):
    """A2 via readStream + availableNow == bounded catch-up semantics."""
    from kinesis_logs_reader_spark.sources.envelope import read_cwl_stream

    stream = read_cwl_stream(spark, path=envelope_dir, typed=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("ingest_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT srcport FROM ingest_sink ORDER BY srcport").collect()
    assert [r.srcport for r in got] == [1024, 1025, 1026, 1027, 1028]


def _mock_kinesis_client():
    """boto3-client mock with the reference's own fixture topology
    (tests/test_kinesis_logs_reader.py:62-101): 2 shards, a control
    message, one shard needing two get_records pages."""
    from unittest.mock import MagicMock

    from tests.conftest import control_message, data_message, gz_blob, make_event

    describe = {
        "StreamDescription": {
            "Shards": [{"ShardId": "shard-0001"}, {"ShardId": "shard-0002"}]
        }
    }
    get_records = {
        "shard-0001_it-1": {
            "Records": [
                {"Data": gz_blob(control_message())},
                {"Data": gz_blob(data_message([make_event(0), make_event(1)]))},
            ],
            "NextShardIterator": "shard-0001_it-2",
            "MillisBehindLatest": 100,
        },
        "shard-0001_it-2": {
            "Records": [{"Data": gz_blob(data_message([make_event(2), make_event(3)]))}],
            "NextShardIterator": "shard-0001_it-3",
            "MillisBehindLatest": 0,
        },
        "shard-0002_it-1": {
            "Records": [{"Data": gz_blob(data_message([make_event(4)]))}],
            "NextShardIterator": "shard-0002_it-2",
            "MillisBehindLatest": 0,
        },
        "shard-0002_it-2": {
            "Records": [],
            "NextShardIterator": "shard-0002_it-3",
            "MillisBehindLatest": 0,
        },
    }
    client = MagicMock()
    client.get_paginator.return_value.paginate.return_value = [describe]
    client.get_shard_iterator.side_effect = lambda **kw: {
        "ShardIterator": f"{kw['ShardId']}_it-1"
    }
    client.get_records.side_effect = lambda **kw: get_records[kw["ShardIterator"]]
    return client


def test_reader_with_injected_client(spark):
    """Reference-shaped construction: KinesisLogsReader(stream,
    kinesis_client=mock) yields every data event and drops control
    messages (reference tests:129-141)."""
    reader = KinesisLogsReader(
        "test-stream", kinesis_client=_mock_kinesis_client(), spark=spark
    )
    rows = sorted((d for d in reader), key=lambda d: d["srcport"])
    expected = sorted(
        (make_event(i)["extractedFields"] for i in range(5)),
        key=lambda d: d["srcport"],
    )
    assert rows == expected


def test_reader_next_protocol(spark):
    """next(reader) peeks one row and iteration resumes after it — the
    reference CLI's header-peek pattern (__main__.py:13-19)."""
    from itertools import chain

    reader = KinesisLogsReader(
        "test-stream", kinesis_client=_mock_kinesis_client(), spark=spark
    )
    first = next(reader)
    assert set(first) == {"srcaddr", "srcport", "dstaddr", "dstport", "protocol"}
    rest = list(chain([first], reader))
    assert len(rest) == 5
    assert reader.next.__call__  # py2-compat alias present


def test_drain_skips_closed_shards():
    """A shard whose NextShardIterator is null (closed, fully read) is
    marked finished instead of KeyError-ing (ADVICE r3)."""
    from unittest.mock import MagicMock

    from kinesis_logs_reader_spark.reader import drain_kinesis_client

    describe = {"StreamDescription": {"Shards": [{"ShardId": "s1"}]}}
    client = MagicMock()
    client.get_paginator.return_value.paginate.return_value = [describe]
    client.get_shard_iterator.return_value = {"ShardIterator": "it-1"}
    client.get_records.return_value = {
        "Records": [{"Data": b"blob"}],
        "NextShardIterator": None,  # closed shard
        "MillisBehindLatest": 500,  # never reports caught-up
    }
    assert drain_kinesis_client(client, "s") == [b"blob"]


def test_drain_record_cap_fails_loud():
    """A live stream that never catches up hits the drain budget and
    raises instead of accumulating driver memory forever."""
    from unittest.mock import MagicMock

    import pytest as _pytest

    from kinesis_logs_reader_spark.reader import drain_kinesis_client

    describe = {"StreamDescription": {"Shards": [{"ShardId": "s1"}]}}
    client = MagicMock()
    client.get_paginator.return_value.paginate.return_value = [describe]
    client.get_shard_iterator.return_value = {"ShardIterator": "it"}
    client.get_records.return_value = {
        "Records": [{"Data": b"x" * 10}] * 7,
        "NextShardIterator": "it",
        "MillisBehindLatest": 999,  # perpetually behind
    }
    with _pytest.raises(RuntimeError, match="driver budget"):
        drain_kinesis_client(client, "s", max_records=20)
    with _pytest.raises(RuntimeError, match="driver budget"):
        drain_kinesis_client(client, "s", max_bytes=100)


def test_reader_rejects_unknown_kwargs(spark):
    """Connector options can't ride in via **kwargs: a non-boto3 kwarg
    fails at the API boundary with a pointer to kinesis_options=."""
    import pytest as _pytest

    with _pytest.raises(TypeError, match="kinesis_options"):
        KinesisLogsReader("s", spark=spark, **{"kinesis.region": "us-east-1"})
