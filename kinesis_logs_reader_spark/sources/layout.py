"""Storage layout management: partitioned writes and compaction.

At 100 TB the table layout IS the query plan's first operator:

- ``write_partitioned``: hive-style directory partitioning on a
  low-cardinality derived key (e.g. order year/month). Readers with a
  predicate on the partition key scan only matching directories —
  partition pruning shows up as ``PartitionFilters`` in the scan node
  (asserted in tests/test_layout.py).
- ``compact``: rewrite a directory to ~target file count. Streaming
  sinks and over-parallel writers leave thousands of small files;
  footer/open overhead then dominates scans. Compaction reads once and
  rewrites with ``coalesce`` (no shuffle — only merges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    derive: dict[str, Column] | None = None,
) -> None:
    """Write parquet partitioned by ``partition_cols`` (optionally
    deriving them first, e.g. ``{"o_year": F.year("o_orderdate")}``)."""
    out = df
    for name, col in (derive or {}).items():
        out = out.withColumn(name, col)
    cols = list(derive or {}) + list(partition_cols or [])
    writer = out.write.mode("overwrite")
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """Rewrite ``path`` to ~``target_files`` parquet files; returns the
    row count (sanity handle for the caller)."""
    df = spark.read.parquet(path)
    n = df.count()
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap via filesystem rename
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n
