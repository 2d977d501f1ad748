"""Scalable global ordering kernels (two-phase rank).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY makes Spark
plan ``Exchange SinglePartition`` + a one-thread sort of the ENTIRE
frame — the classic global-window scale killer. At sf0.1 it hides in
the session floor; at sf~1 it read growth 5.71 on q21 (SCALE_FULL
r13), and at 100 TB it is a guaranteed driver-adjacent OOM/stall.

:func:`global_row_number` computes the identical rank with no
single-partition stage over the data:

1. one min/max aggregate over a caller-supplied NON-NULL numeric
   ``bucket_by`` expression that is monotone non-decreasing along the
   requested order (helpers below build it for numeric and string
   keys, either direction);
2. every row maps to an equi-width bucket of that range — a PURE
   function of the row, broadcast-joined scalars only;
3. local rank = ``row_number() OVER (PARTITION BY bucket ORDER BY
   <order>)`` — an ordinary parallel window (one hash exchange);
4. per-bucket counts -> exclusive prefix sums -> broadcast join adds
   each bucket's global offset. The only single-partition stage is the
   cumsum over the <=4x-shuffle-partitions-row counts frame.

WHY NOT ``repartitionByRange`` + ``monotonically_increasing_id`` (the
first form of this kernel): RangePartitioner draws its sample with an
RDD-id-derived seed, so two executions of the same plan can cut
DIFFERENT boundaries. The counts subtree and the final subtree are two
executions unless ReusedExchange happens to fire — and when it did not
(q110's cached bm25 frame), ranks came out with duplicates, gaps, and
run-to-run instability. Correctness must not depend on an optimizer
reuse rule: here bucket assignment is a deterministic function of the
row and the (order-insensitive, exact) min/max aggregate, so every
subtree that recomputes it agrees, reuse or no reuse. Pinned by
test_rank.py's cached-input + tie-heavy regression tests.

Because the order must be TOTAL (callers end it with a unique key),
rank values are independent of bucket boundaries entirely — ties on
``bucket_by`` all land in one bucket (equal value -> equal bucket), and
the full ORDER BY disambiguates inside. Skew note: equi-width buckets
inherit the data's distribution; NB = 4x shuffle partitions gives
headroom, and a pathologically clumped key degrades to fewer effective
buckets — the same exposure any single-key window has, with AQE skew
handling as the backstop.

Reference parity: the reference's single-process reader gets global
order for free by being single-process (kinesis_logs_reader.py:137's
ordered iteration); this kernel is what that semantics costs on a
cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "global_row_number",
    "global_ntile",
    "string_order_key",
    "q206_scalable_rank_suite",
]


def string_order_key(col: Column) -> Column:
    """Monotone (byte-collation) bigint encoding of a string column:
    the first 4 bytes of the NUL-right-padded UTF-8 encoding as a
    big-endian integer (the repo's pinned conv(hex) contract). Strings
    sharing a 4-byte prefix collide into one bucket — allowed, the
    full ORDER BY disambiguates inside the bucket. NULLs stay NULL;
    the caller maps them to a sentinel on the right end for the
    NULLS FIRST/LAST placement the order needs."""
    padded = F.substring(F.encode(F.rpad(col, 4, "\x00"), "UTF-8"), 1, 4)
    return F.conv(F.hex(padded), 16, 10).cast("bigint")


def _with_rank(
    df: DataFrame,
    order: list[Column],
    out_col: str,
    bucket_by: Column,
    spread_by: Column | None = None,
) -> DataFrame:
    """Internal: df + ``out_col`` = 1-based global rank (bigint).
    ``bucket_by`` MUST be non-null, non-NaN, and monotone
    non-decreasing along ``order`` (equal order-keys may share a
    value; a larger-ordered row must never have a smaller one), and —
    because both modes cast it to double for the bucket cut — its
    values MUST satisfy |value| < 2**53: integer keys past the double
    mantissa silently lose monotonicity under the cast and would
    produce duplicate/gapped ranks with no error (ADVICE r13; current
    callers stay under 2**33 — string_order_key tops out at 2**32).
    The same bound applies to ``spread_by``.

    Equi-width mode (``spread_by=None``) splits the bucket_by RANGE —
    right when the key is spread (scores, lengths). A low-cardinality
    key defeats it: all of a value's rows land in one bucket, and the
    per-bucket sort loses its parallelism (q21's 5 priority strings
    measured 5.3 s at sf~1 this way).

    Value-class mode (``spread_by=<numeric non-null Column>``): the
    bucket IS the raw bucket_by value, and each class splits further by
    an equi-width cut of ``spread_by`` — valid because within one
    bucket_by class the remaining order is exactly the tie-break, and
    ``spread_by`` must be monotone non-decreasing along THAT tie-break
    (pass the unique tie key itself). Caller contract: bucket_by has
    BOUNDED distinct values (the counts frame is |classes| x
    sub-buckets). This restores full parallel sorts on tie-heavy keys:
    q21 runs ~6 x 4 x shuffle-partitions balanced partitions."""
    spark = df.sparkSession
    nb = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    frame = df.withColumn("_bv", bucket_by.cast("double"))
    if spread_by is None:
        rng = frame.groupBy().agg(
            F.min("_bv").alias("_lo"), F.max("_bv").alias("_hi")
        )
        bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col("_bv") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * nb
                ).cast("int"),
            )
        )
        bkt = (
            frame.join(F.broadcast(rng))
            .withColumn("_bkt", F.lit(0.0))
            .withColumn("_sub", bucket)
            .drop("_bv", "_lo", "_hi")
        )
    else:
        frame = frame.withColumn("_sv", spread_by.cast("double"))
        rng = frame.groupBy().agg(
            F.min("_sv").alias("_lo"), F.max("_sv").alias("_hi")
        )
        sub = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col("_sv") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * nb
                ).cast("int"),
            )
        )
        bkt = (
            frame.join(F.broadcast(rng))
            .withColumn("_bkt", F.col("_bv"))
            .withColumn("_sub", sub)
            .drop("_bv", "_sv", "_lo", "_hi")
        )
    w_local = Window.partitionBy("_bkt", "_sub").orderBy(*order)
    local = bkt.withColumn("_lrn", F.row_number().over(w_local))
    # Bucket sizes from max(local rank) ABOVE the window's own exchange:
    # the groupBy's clustering requirement is already satisfied by the
    # window's hashpartitioning(_bkt), so no second corpus-scale chain
    # exists in the plan, and the (now fully deterministic) window
    # subtree canonicalizes identically for both consumers, so the
    # shuffle materializes once via ReusedExchange. Even if reuse ever
    # failed, every recomputation agrees — bucket assignment is a pure
    # row function — so this is a performance property, not a
    # correctness precondition (the sampled-boundary lesson above).
    counts = local.groupBy("_bkt", "_sub").agg(F.max("_lrn").alias("_n"))
    w_off = Window.orderBy("_bkt", "_sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_bkt",
        "_sub",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_bkt", "_sub"])
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_bkt", "_sub", "_lrn", "_off")
    )


def global_row_number(
    df: DataFrame,
    order: list[Column],
    bucket_by: Column,
    out_col: str = "rnk",
    spread_by: Column | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY <order>)`` without a
    single-partition exchange over the data. ``order`` MUST be a total
    order (end it with a unique key); ``bucket_by`` per
    :func:`_with_rank`'s contract. Returns int (row_number's type)."""
    return _with_rank(df, order, out_col, bucket_by, spread_by).withColumn(
        out_col, F.col(out_col).cast("int")
    )


def global_ntile(
    df: DataFrame,
    order: list[Column],
    n_tiles: int,
    bucket_by: Column,
    out_col: str = "bucket",
    spread_by: Column | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY <order>)`` via the same two-phase
    rank. Exact SQL NTILE semantics for non-divisible totals: the
    first ``total % n`` buckets take ``total // n + 1`` rows each."""
    ranked = _with_rank(df, order, "_gr", bucket_by, spread_by)
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

    Scale shape: one min/max scalar aggregate, one hash exchange for
    the bucketed window, a <=4x-partitions-row offsets broadcast, a
    1-row total broadcast — nothing single-partition touches data.
    This is the oracle-backed certification of operators/rank.py; q21
    pins the same kernel on the orders table (plan pin in
    test_plans.py).
    """
    from kinesis_logs_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.coalesce(F.col("text"), F.lit(""))).alias("_len")
    )
    order = [F.col("_len").desc_nulls_last(), F.col("doc_id")]
    ranked = _with_rank(docs, order, "rnk", bucket_by=-F.col("_len"))
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
