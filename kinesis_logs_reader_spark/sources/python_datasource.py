"""Custom Python DataSource (Spark 4 API): ``cwl_envelope`` format.

The reference's shard model, expressed as a real Spark connector
(public ``pyspark.sql.datasource`` API):

- **shard -> input partition** (reference kinesis_logs_reader.py:61-66
  discovers shards; here each immediate subdirectory of ``path`` is one
  shard, and each shard becomes one ``InputPartition``, so shards read
  in parallel exactly like the Kinesis connector maps shards).
- **paged fetch** (reference :79-95): files within a shard are read in
  sorted order, one gzipped JSON envelope per file — the stand-in for
  ``get_records`` pages.
- **bounded catch-up / LATEST semantics** (reference :84,103-104): the
  streaming reader tracks a per-shard consumed-file offset and returns
  only new files each microbatch; ``Trigger.AvailableNow`` drains and
  stops.

The decode chain (gunzip -> json -> drop CONTROL_MESSAGE -> flatten ->
project extractedFields) runs inside the partition reader, mirroring
R5-R9. For the declarative-pipeline variant of the same semantics see
:mod:`kinesis_logs_reader_spark.sources.envelope`; this module is the
connector-shaped packaging of it.
"""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("fields", T.MapType(T.StringType(), T.StringType()))]
)


def _shard_dirs(path: str) -> list[str]:
    subdirs = sorted(
        os.path.join(path, d)
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
    )
    return subdirs or [path]


def _shard_files(shard_dir: str) -> list[str]:
    return sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".gz")
    )


def _decode_file(fpath: str):
    """R5-R9 for one envelope blob (reference kinesis_logs_reader.py:87-95)."""
    with open(fpath, "rb") as fobj:
        envelope = json.loads(gzip.decompress(fobj.read()).decode("utf-8"))
    if envelope.get("messageType") != "DATA_MESSAGE":
        return
    for event in envelope.get("logEvents", []):
        yield (event.get("extractedFields", {}),)


class ShardPartition(InputPartition):
    def __init__(self, shard_dir: str, start_file: int = 0, end_file: int | None = None):
        self.shard_dir = shard_dir
        self.start_file = start_file
        self.end_file = end_file


class CwlEnvelopeReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cwl_envelope: 'path' option is required")

    def partitions(self):
        # one shard directory -> one input partition (reference :61-66)
        return [ShardPartition(d) for d in _shard_dirs(self.path)]

    def read(self, partition: ShardPartition):
        files = _shard_files(partition.shard_dir)[partition.start_file : partition.end_file]
        for fpath in files:
            yield from _decode_file(fpath)


class CwlEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Microbatch file-replay: offset = consumed-file count per shard."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cwl_envelope: 'path' option is required")

    def initialOffset(self):
        return {d: 0 for d in _shard_dirs(self.path)}

    def read(self, start: dict):
        rows: list[tuple] = []
        end: dict = {}
        for shard_dir in _shard_dirs(self.path):
            files = _shard_files(shard_dir)
            consumed = int(start.get(shard_dir, 0))
            for fpath in files[consumed:]:
                rows.extend(_decode_file(fpath))
            end[shard_dir] = len(files)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for shard_dir in _shard_dirs(self.path):
            files = _shard_files(shard_dir)
            lo = int(start.get(shard_dir, 0))
            hi = int(end.get(shard_dir, len(files)))
            for fpath in files[lo:hi]:
                rows.extend(_decode_file(fpath))
        return iter(rows)


class CwlEnvelopeDataSource(DataSource):
    """``spark.read.format("cwl_envelope").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "cwl_envelope"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return CwlEnvelopeReader(self.options)

    def simpleStreamReader(self, schema):
        return CwlEnvelopeStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CwlEnvelopeDataSource)
