"""Semantics pins for the two-phase global rank kernel (operators/rank.py).

The kernel must be BIT-IDENTICAL to the single-partition window forms
(`row_number()/ntile(n) OVER (ORDER BY ...)`) it replaces — these tests
compare both forms directly, including the NTILE fat-bucket rule on
non-divisible totals and desc_nulls_last orderings.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.operators.rank import global_ntile, global_row_number


def _frame(spark, n=257):
    # deterministic, shuffled insertion order, with NULLs in the key
    rows = [((i * 83) % n, None if i % 7 == 0 else f"k{(i * 131) % n:04d}") for i in range(n)]
    return spark.createDataFrame(rows, "id int, key string")


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    order = [F.col("key").desc_nulls_last(), F.col("id")]
    got = {r.id: r.rnk for r in global_row_number(df, order).collect()}
    w = Window.orderBy(*order)
    want = {r.id: r.rnk for r in df.withColumn("rnk", F.row_number().over(w)).collect()}
    assert got == want


def test_global_row_number_type_is_int(spark):
    df = _frame(spark, 11)
    out = global_row_number(df, [F.col("id")])
    assert dict(out.dtypes)["rnk"] == "int"


def test_global_ntile_matches_window_non_divisible(spark):
    # 257 rows / 10 tiles: first 7 buckets get 26 rows, the rest 25 —
    # the SQL NTILE fat-bucket rule the closed form must reproduce.
    df = _frame(spark)
    order = [F.col("key").asc_nulls_first(), F.col("id")]
    got = {r.id: r.bucket for r in global_ntile(df, order, 10).collect()}
    w = Window.orderBy(*order)
    want = {
        r.id: r.bucket for r in df.withColumn("bucket", F.ntile(10).over(w)).collect()
    }
    assert got == want


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = _frame(spark, 4)
    got = {r.id: r.bucket for r in global_ntile(df, [F.col("id")], 10).collect()}
    w = Window.orderBy("id")
    want = {
        r.id: r.bucket for r in df.withColumn("bucket", F.ntile(10).over(w)).collect()
    }
    assert got == want


def test_global_row_number_no_single_partition_over_data(spark):
    """The scale property itself: the only SinglePartition exchange in
    the plan feeds the #partitions-row offsets frame, never the data.
    The data rides rangepartitioning."""
    df = _frame(spark, 1000)
    out = global_row_number(df, [F.col("key").desc_nulls_last(), F.col("id")])
    from kinesis_logs_reader_spark.plans import explain

    plan = explain.formatted_plan(out)
    assert plan.count("SinglePartition") == 1
    assert "rangepartitioning" in plan
