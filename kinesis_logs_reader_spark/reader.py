"""User-facing reader facade: the reference's API, Spark execution.

The reference exposes ``KinesisLogsReader(stream_name, start_time=None,
kinesis_client=None, **kwargs)`` as an iterator of flat dicts
(kinesis_logs_reader.py:23-56). This class keeps that contract — a user
of the reference can iterate the same way — while execution happens in
Spark: the plan is the declarative envelope chain from
:mod:`kinesis_logs_reader_spark.sources.envelope`, and iteration uses
``toLocalIterator`` so the driver never materializes the full stream.

For hermetic use (tests, local replay) pass ``path=`` pointing at a
directory of gzipped envelope blobs; for live Kinesis pass
``kinesis_options=`` for the connector. ``start_time`` maps to the
connector's ``at_timestamp`` starting position, the reference's
AT_TIMESTAMP iterator (kinesis_logs_reader.py:68-77).
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from kinesis_logs_reader_spark.sources.envelope import read_cwl_batch, read_cwl_stream


class KinesisLogsReader:
    """Iterator of flat log-event dicts, reference-compatible surface."""

    def __init__(
        self,
        stream_name: str | None = None,
        start_time: datetime | None = None,
        *,
        spark: SparkSession | None = None,
        path: str | None = None,
        typed: bool = False,
        **kinesis_kwargs: str,
    ) -> None:
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.stream_name = stream_name
        if path is not None:
            # start_time -> modifiedAfter: the AT_TIMESTAMP analog for replay
            self.df: DataFrame = read_cwl_batch(
                self.spark, path, typed=typed, start_time=start_time
            )
        else:
            options = {"streamName": stream_name or "", **kinesis_kwargs}
            if start_time is not None:
                options["startingPosition"] = start_time.isoformat()
            self.df = read_cwl_stream(self.spark, kinesis_options=options, typed=typed)
        self._typed = typed

    def to_df(self) -> DataFrame:
        return self.df

    def __iter__(self) -> Iterator[dict]:
        # Reference __iter__/__next__: kinesis_logs_reader.py:48-56.
        # Batch path only; a streaming DataFrame cannot be iterated.
        if self.df.isStreaming:
            raise TypeError("streaming reader: use to_df() + writeStream")
        if self._typed:
            for row in self.df.toLocalIterator():
                yield row.asDict()
        else:
            for row in self.df.toLocalIterator():
                yield dict(row["fields"])
