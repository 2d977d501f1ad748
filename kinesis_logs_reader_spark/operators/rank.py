"""Scalable global ordering kernels (two-phase rank).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY makes Spark
plan ``Exchange SinglePartition`` + a one-thread sort of the ENTIRE
frame — the classic global-window scale killer. At sf0.1 it hides in
the session floor; at sf~1 it read growth 5.71 on q21 (SCALE_FULL
r13), and at 100 TB it is a guaranteed driver-adjacent OOM/stall.

:func:`global_row_number` computes the identical rank with no
single-partition stage over the data:

1. ``repartitionByRange`` on the ordering — a PARALLEL range exchange
   (sampled boundaries; partition id increases along the order);
2. ``sortWithinPartitions`` — parallel local sorts;
3. ``monotonically_increasing_id`` — splits into (partition id,
   0-based local position) for free: the id is documented as
   ``pid << 33 | local_row_index``, and after the local sort the local
   index IS the local rank;
4. per-partition row counts (a partial-agg shuffle of at most
   #partitions rows) -> exclusive prefix sums -> broadcast join adds
   each partition's global offset.

The only single-partition window left runs over the #partitions-row
counts frame. Because the ordering must be TOTAL (callers pass a
unique tie-break key, same as any deterministic rank), the result is
independent of where the sampled range boundaries fall, so the rank
values are bit-stable across partition counts, AQE coalescing, and
engines. The range exchange appears in two subtrees (counts + final)
with identical canonical form, so Spark materializes it ONCE and
feeds the second consumer through ReusedExchange — verified in the
q21 plan pin (tests/test_plans.py).

Reference parity: the reference's single-process reader gets global
order for free by being single-process (kinesis_logs_reader.py:137's
ordered iteration); this kernel is what that semantics costs on a
cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_row_number", "global_ntile", "q206_scalable_rank_suite"]

_LOCAL_MASK = (1 << 33) - 1


def _with_rank(df: DataFrame, order: list[Column], out_col: str) -> DataFrame:
    """Internal: df + ``out_col`` = 1-based global rank (bigint)."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n, *order).sortWithinPartitions(*order)
    wid = (
        ranged.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK)))
    )
    counts = wid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        wid.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_local") + F.lit(1))
        .drop("_mid", "_pid", "_local", "_off")
    )


def global_row_number(
    df: DataFrame, order: list[Column], out_col: str = "rnk"
) -> DataFrame:
    """``row_number() OVER (ORDER BY <order>)`` without the
    single-partition exchange. ``order`` MUST be a total order (end it
    with a unique key) — that is what makes the rank well-defined and
    partition-boundary-independent. Returns int (row_number's type).
    """
    return _with_rank(df, order, out_col).withColumn(
        out_col, F.col(out_col).cast("int")
    )


def global_ntile(
    df: DataFrame, order: list[Column], n_tiles: int, out_col: str = "bucket"
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY <order>)`` via the same two-phase
    rank. Exact SQL NTILE semantics for non-divisible totals: the
    first ``total % n`` buckets take ``total // n + 1`` rows each.
    The row count reuses the rank kernel's counts subtree (same
    canonical aggregate -> same reused exchange).
    """
    ranked = _with_rank(df, order, "_gr")
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("_total"))
    big = F.floor(F.col("_total") / n_tiles) + 1  # rows in the fat buckets
    rem = F.col("_total") % n_tiles  # how many fat buckets
    cut = big * rem  # rows covered by fat buckets
    bucket = F.when(
        F.col("_gr") <= cut, F.floor((F.col("_gr") - 1) / big) + 1
    ).otherwise(rem + F.floor((F.col("_gr") - 1 - cut) / (big - 1)) + 1)
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_gr", "_total")
    )


def q206_scalable_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable global window functions — row_number, NTILE,
    percent_rank, cume_dist over a corpus-scale total order, all from
    ONE two-phase rank (no single-partition exchange over the data).

    Ranks every document by (char length DESC, doc_id), then derives:
    - ``bucket``: NTILE(16) via the fat-bucket closed form;
    - ``pr_ppm``: percent_rank in exact integer ppm,
      (rnk-1)*1e6 div (total-1) — rank==row_number because the order is
      total, so DuckDB's tie-aware PERCENT_RANK agrees bit-for-bit;
    - ``cd_ppm``: cume_dist in ppm, rnk*1e6 div total.
    Output is the deterministic doc_id % 13 == 0 sample (bounded at any
    SF by |docs|/13) — sampled AFTER ranking, so the hash still pins
    global positions across the whole order.

    Scale shape: one parallel range exchange (reused by the counts
    subtree at runtime), a #partitions-row offsets broadcast, a 1-row
    total broadcast — nothing single-partition touches data. This is
    the oracle-backed certification of operators/rank.py; q21 pins the
    same kernel on the orders table (plan pin in test_plans.py).
    """
    from kinesis_logs_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.coalesce(F.col("text"), F.lit(""))).alias("_len")
    )
    order = [F.col("_len").desc_nulls_last(), F.col("doc_id")]
    ranked = _with_rank(docs, order, "rnk")
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("_total"))
    big = F.floor(F.col("_total") / 16) + 1
    rem = F.col("_total") % 16
    cut = big * rem
    bucket = F.when(
        F.col("rnk") <= cut, F.floor((F.col("rnk") - 1) / big) + 1
    ).otherwise(rem + F.floor((F.col("rnk") - 1 - cut) / (big - 1)) + 1)
    return (
        ranked.join(F.broadcast(total))
        .filter(F.col("doc_id") % 13 == 0)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            bucket.cast("int").alias("bucket"),
            F.expr("((rnk - 1) * 1000000L) div (_total - 1)").alias("pr_ppm"),
            F.expr("(rnk * 1000000L) div _total").alias("cd_ppm"),
        )
        .orderBy("doc_id")
    )
