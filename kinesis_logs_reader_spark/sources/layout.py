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


def write_training_shards(
    docs: DataFrame, path: str, epochs: int = 2, n_shards: int = 8
) -> None:
    """Materialize the q161 training order as consumable shard files.

    Hive layout ``epoch=E/shard=S/`` with exactly one parquet file per
    (epoch, shard), rows stored in training-position order — the
    artifact a training data loader streams sequentially: workers each
    own a shard directory, read its single sorted file front to back,
    and the global order is reproducible because the permutation is
    the deterministic md5 order of
    :func:`...operators.preprocess.epoch_shuffle_ranked` (the SAME DAG
    q161's audit aggregate certifies — checksum-green driver rows
    certify these files' contents).

    ``repartition(epoch, shard)`` hash-places every (epoch, shard)
    group into its own task so each hive leaf gets one file whose
    in-file row order is the within-shard sort. At 100 TB, shard
    count scales with worker count, files stay ~corpus/(E*S) sized,
    and the writer is the q161 window plan plus a parquet sink —
    no extra shuffle beyond the rank window itself.
    """
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.operators.preprocess import (
        epoch_shuffle_ranked,
    )

    ranked = epoch_shuffle_ranked(docs, epochs=epochs, n_shards=n_shards)
    (
        ranked.repartition(epochs * n_shards, "epoch", "shard")
        .sortWithinPartitions("epoch", "shard", "pos")
        .select("doc_id", "pos", "epoch", "shard")
        .write.mode("overwrite")
        .partitionBy("epoch", "shard")
        .parquet(path)
    )
