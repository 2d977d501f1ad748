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


def morton_z(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns.

    Bit i of x lands at position 2i, bit i of y at 2i+1 — points close
    in (x, y) cluster close in z. All literal-shift bitwise expressions
    (one whole-stage-codegen span, no UDF). 2*bits <= 62 keeps the
    result in a positive BIGINT.
    """
    from pyspark.sql import functions as F

    xs = x.cast("bigint")
    ys = y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftrightunsigned(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_write(df: DataFrame, path: str, x: Column, y: Column, n_files: int = 8) -> None:
    """Write parquet clustered on the Morton curve of (x, y).

    ``repartitionByRange`` on z splits the curve into contiguous file
    ranges, ``sortWithinPartitions`` makes row groups monotonic in z —
    so every file covers a tight (x, y) box and min/max footer stats
    prune 2-D box predicates that neither single-column sort could.
    The standard data-skipping layout when queries filter two
    dimensions at once (e.g. user x time) and hive-partitioning on
    either would over-shard.
    """
    (
        df.withColumn("_z", morton_z(x, y))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
