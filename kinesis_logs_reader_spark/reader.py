"""User-facing reader facade: the reference's API, Spark execution.

The reference exposes ``KinesisLogsReader(stream_name, start_time=None,
kinesis_client=None, **kwargs)`` as an iterator of flat dicts
(kinesis_logs_reader.py:21-56). This class keeps that contract — a
reference-shaped snippet runs unmodified, including ``next(reader)`` and
a pre-built (or mocked, as in the reference's own tests
tests/test_kinesis_logs_reader.py:96-107) ``kinesis_client`` — while
execution happens in Spark: the heavy work (gunzip, JSON parse, control
filter, flatten, project) is the declarative envelope chain from
:mod:`kinesis_logs_reader_spark.sources.envelope`, and iteration uses
``toLocalIterator`` so the driver never materializes the full stream.

Sources, in precedence order:

- ``kinesis_client=``: a boto3-style client. The shard protocol
  (describe_stream pagination -> get_shard_iterator -> get_records until
  every shard reports ``MillisBehindLatest == 0``) is inherently serial
  per shard — each call needs the previous ``NextShardIterator`` — so it
  runs driver-side exactly as the reference does
  (kinesis_logs_reader.py:61-104), but ONLY as the I/O tap: raw gzipped
  blobs go straight into a DataFrame and all decoding is distributed.
- ``path=``: hermetic batch replay of a directory of gzipped envelope
  blobs; ``start_time`` maps to ``modifiedAfter`` (the AT_TIMESTAMP
  analog for replay).
- otherwise: a boto3 client is built from ``**kwargs`` when boto3 is
  importable (reference ``_get_client``, kinesis_logs_reader.py:57-58);
  failing that, ``**kwargs`` pass through as Spark Kinesis connector
  options and ``to_df()`` returns the streaming DataFrame.
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from kinesis_logs_reader_spark.sources.envelope import (
    decode_envelope,
    read_cwl_batch,
    read_cwl_stream,
    typed_flow_logs,
)


def drain_kinesis_client(kinesis_client, stream_name: str, start_time=None) -> list[bytes]:
    """Drain every shard of ``stream_name`` to a list of raw gzipped blobs.

    Mirrors the reference's shard protocol 1:1 (kinesis_logs_reader.py:
    61-104): shard discovery via the describe_stream paginator, LATEST /
    AT_TIMESTAMP shard iterators, round-robin get_records, bounded-by-now
    stop when every shard reports ``MillisBehindLatest == 0`` — the
    reference's AvailableNow semantics. Record payloads are NOT decoded
    here; that happens distributed, in the envelope chain.
    """
    paginator = kinesis_client.get_paginator("describe_stream")
    shard_ids = [
        shard["ShardId"]
        for page in paginator.paginate(StreamName=stream_name)
        for shard in page.get("StreamDescription", {}).get("Shards", [])
    ]

    iterators: dict[str, str] = {}
    for shard_id in shard_ids:
        kwargs = {"StreamName": stream_name, "ShardId": shard_id}
        if start_time is None:
            kwargs["ShardIteratorType"] = "LATEST"
        else:
            kwargs["ShardIteratorType"] = "AT_TIMESTAMP"
            kwargs["Timestamp"] = start_time
        iterators[shard_id] = kinesis_client.get_shard_iterator(**kwargs)[
            "ShardIterator"
        ]

    finished = {shard_id: False for shard_id in shard_ids}
    blobs: list[bytes] = []
    while shard_ids and not all(finished.values()):
        for shard_id in shard_ids:
            response = kinesis_client.get_records(ShardIterator=iterators[shard_id])
            iterators[shard_id] = response["NextShardIterator"]
            finished[shard_id] = response["MillisBehindLatest"] == 0
            for record in response.get("Records", []):
                blobs.append(record["Data"])
    return blobs


class KinesisLogsReader:
    """Iterator of flat log-event dicts, reference-compatible surface."""

    def __init__(
        self,
        stream_name: str | None = None,
        start_time: datetime | None = None,
        kinesis_client=None,
        *,
        spark: SparkSession | None = None,
        path: str | None = None,
        typed: bool = False,
        **kwargs,
    ) -> None:
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.stream_name = stream_name
        self.kinesis_client = kinesis_client
        self._typed = typed
        self._iterator: Iterator[dict] | None = None

        if kinesis_client is None and path is None:
            # Reference default: build a client from session kwargs
            # (kinesis_logs_reader.py:33-34,57-58). boto3 is an optional
            # dependency here; without it fall through to the connector.
            try:
                from boto3.session import Session  # type: ignore

                self.kinesis_client = kinesis_client = Session(**kwargs).client(
                    "kinesis"
                )
                kwargs = {}
            except ImportError:
                pass

        if kinesis_client is not None:
            blobs = drain_kinesis_client(kinesis_client, stream_name or "", start_time)
            raw = self.spark.createDataFrame(
                [(b,) for b in blobs], "data binary"
            )
            events = decode_envelope(raw)
            self.df: DataFrame = typed_flow_logs(events) if typed else events
        elif path is not None:
            # start_time -> modifiedAfter: the AT_TIMESTAMP analog for replay
            self.df = read_cwl_batch(
                self.spark, path, typed=typed, start_time=start_time
            )
        else:
            options = {"streamName": stream_name or "", **kwargs}
            if start_time is not None:
                options["startingPosition"] = start_time.isoformat()
            self.df = read_cwl_stream(self.spark, kinesis_options=options, typed=typed)

    def to_df(self) -> DataFrame:
        return self.df

    def _rows(self) -> Iterator[dict]:
        if self.df.isStreaming:
            raise TypeError("streaming reader: use to_df() + writeStream")
        if self._typed:
            for row in self.df.toLocalIterator():
                yield row.asDict()
        else:
            for row in self.df.toLocalIterator():
                yield dict(row["fields"])

    # Reference iterator protocol (kinesis_logs_reader.py:46-55): the
    # object is its own single-pass iterator, and its CLI peeks the first
    # row via next(reader) (__main__.py:14).
    def __iter__(self) -> "KinesisLogsReader":
        return self

    def __next__(self) -> dict:
        if self._iterator is None:
            self._iterator = self._rows()
        return next(self._iterator)

    def next(self) -> dict:
        # Py2-compat alias kept for surface parity (kinesis_logs_reader.py:53-55)
        return self.__next__()
