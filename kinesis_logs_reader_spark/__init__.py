"""kinesis_logs_reader_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``obsrvbl-oss/kinesis-logs-reader`` (reference, read-only, at
/root/reference/), re-expressed Spark-first:

- The reference's single pipeline (Kinesis shard poll -> gunzip -> JSON
  parse -> control-message filter -> flatten -> project -> limit -> TSV;
  reference kinesis_logs_reader/kinesis_logs_reader.py:79-104) becomes a
  declarative DataFrame chain over Structured Streaming / batch sources
  (:mod:`kinesis_logs_reader_spark.sources.envelope`).
- On top of that ingest surface sits a full relational operator inventory
  (joins, aggregation, windows, set ops), streaming windows/state, and
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing), all designed for a 1000-executor / 100 TB target:
  declarative plans for Catalyst, broadcast hints for small dims,
  map-side-combinable aggregations, no driver-side loops.
"""

from kinesis_logs_reader_spark.session import build_session, configure_runtime
from kinesis_logs_reader_spark.sources.tables import TABLE_NAMES, load_table, register_views
from kinesis_logs_reader_spark.sources.envelope import read_cwl_batch, read_cwl_stream
from kinesis_logs_reader_spark.reader import KinesisLogsReader

__all__ = [
    "build_session",
    "configure_runtime",
    "TABLE_NAMES",
    "load_table",
    "register_views",
    "read_cwl_batch",
    "read_cwl_stream",
    "KinesisLogsReader",
]

__version__ = "0.1.0"
