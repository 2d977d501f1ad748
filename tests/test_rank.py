"""Semantics pins for the two-phase global rank kernel (operators/rank.py).

The kernel must be BIT-IDENTICAL to the single-partition window forms
(`row_number()/ntile(n) OVER (ORDER BY ...)`) it replaces — these tests
compare both forms directly, including the NTILE fat-bucket rule on
non-divisible totals and desc_nulls_last orderings.

The cached/tie-heavy regression test pins the bug that killed the first
(repartitionByRange + monotonically_increasing_id) form of the kernel:
RangePartitioner samples boundaries with an RDD-id-derived seed, so the
counts subtree and the final subtree could cut DIFFERENT boundaries
whenever ReusedExchange did not fire (q110's cached bm25 frame measured
4216/4814 wrong ranks, with duplicates, gaps, and run-to-run drift).
The deterministic-bucket form must produce identical, duplicate-free
ranks on every execution, reuse or no reuse.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.operators.rank import (
    global_ntile,
    global_row_number,
    string_order_key,
)


def _frame(spark, n=257):
    # deterministic, shuffled insertion order, with NULLs in the key
    rows = [((i * 83) % n, None if i % 7 == 0 else f"k{(i * 131) % n:04d}") for i in range(n)]
    return spark.createDataFrame(rows, "id int, key string")


def _desc_nulls_last_bucket(col):
    return F.when(col.isNull(), F.lit(2**33).cast("bigint")).otherwise(
        -string_order_key(col)
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    order = [F.col("key").desc_nulls_last(), F.col("id")]
    got = {
        r.id: r.rnk
        for r in global_row_number(
            df, order, bucket_by=_desc_nulls_last_bucket(F.col("key"))
        ).collect()
    }
    w = Window.orderBy(*order)
    want = {r.id: r.rnk for r in df.withColumn("rnk", F.row_number().over(w)).collect()}
    assert got == want


def test_global_row_number_type_is_int(spark):
    df = _frame(spark, 11)
    out = global_row_number(df, [F.col("id")], bucket_by=F.col("id"))
    assert dict(out.dtypes)["rnk"] == "int"


def test_global_ntile_matches_window_non_divisible(spark):
    # 257 rows / 10 tiles: first 7 buckets get 26 rows, the rest 25 —
    # the SQL NTILE fat-bucket rule the closed form must reproduce.
    df = _frame(spark)
    order = [F.col("key").asc_nulls_first(), F.col("id")]
    bucket_by = F.when(F.col("key").isNull(), F.lit(-(2**33)).cast("bigint")).otherwise(
        string_order_key(F.col("key"))
    )
    got = {r.id: r.bucket for r in global_ntile(df, order, 10, bucket_by).collect()}
    w = Window.orderBy(*order)
    want = {
        r.id: r.bucket for r in df.withColumn("bucket", F.ntile(10).over(w)).collect()
    }
    assert got == want


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = _frame(spark, 4)
    got = {
        r.id: r.bucket
        for r in global_ntile(df, [F.col("id")], 10, bucket_by=F.col("id")).collect()
    }
    w = Window.orderBy("id")
    want = {
        r.id: r.bucket for r in df.withColumn("bucket", F.ntile(10).over(w)).collect()
    }
    assert got == want


def test_rank_stable_on_cached_tie_heavy_frame(spark):
    """The q110 regression: a PERSISTED frame whose sort key is a
    heavily-tied rounded double. The sampled-boundary kernel produced
    duplicate/gapped ranks that drifted between runs here (counts and
    final subtrees cut different boundaries when ReusedExchange did not
    fire). The deterministic-bucket kernel must emit a duplicate-free
    permutation 1..n, identical across executions, equal to the window
    form."""
    n = 4000
    rows = [(i, round(((i * 37) % 50) / 7.0, 4)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score double").persist()
    df.count()  # materialize the cache (InMemoryTableScan upstream)
    try:
        order = [F.col("score").desc(), F.col("doc_id")]
        k = global_row_number(df, order, bucket_by=-F.col("score"), out_col="rk")
        run1 = {r.doc_id: r.rk for r in k.collect()}
        run2 = {r.doc_id: r.rk for r in k.collect()}
        assert run1 == run2
        assert sorted(run1.values()) == list(range(1, n + 1))  # no dups, no gaps
        w = Window.orderBy(*order)
        want = {
            r.doc_id: r.rw
            for r in df.withColumn("rw", F.row_number().over(w)).collect()
        }
        assert run1 == want
    finally:
        df.unpersist()


def test_string_order_key_monotone_tricky_cases(spark):
    """Byte-prefix encoding must be monotone in Spark's binary string
    order, including prefix-vs-extension pairs ('ab' < 'ab!', 'aaz' <
    'ab') that a space-padded encoding gets wrong."""
    vals = ["", "a", "aaz", "ab", "ab!", "abc", "abcd", "abcde", "b", "zz"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = df.select("s", string_order_key(F.col("s")).alias("k")).collect()
    by_string = [r.k for r in sorted(out, key=lambda r: r.s)]
    assert by_string == sorted(by_string)


def test_global_row_number_no_single_partition_over_data(spark):
    """The scale property itself: every SinglePartition exchange in the
    plan sits above an aggregate (the min/max scalars, the bucket-count
    cumsum) — partial-agg rows cross it, never the data. The data rides
    one hash exchange for the bucketed window. Same walk as
    tools/audit_plans.py scan 3."""
    df = _frame(spark, 1000)
    out = global_row_number(
        df,
        [F.col("key").desc_nulls_last(), F.col("id")],
        bucket_by=_desc_nulls_last_bucket(F.col("key")),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def depth(line):
        return len(line) - len(line.lstrip(" :+-*("))

    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        for sub in lines[i + 1 :]:
            if sub.strip() and depth(sub) <= d:
                break
            if "Aggregate" in sub:
                break  # aggregated below: partial rows only, fine
            assert "Scan" not in sub, f"data-sized SinglePartition: {line.strip()}"
    assert ("hashpartitioning(_bkt" in plan) or ("hashpartitioning(_sub" in plan)


def test_value_class_mode_matches_window(spark):
    """The q21 shape: a 5-value class key (equi-width bucketing would
    serialize each class onto one thread) + the unique tie key as
    spread_by. Must equal the window form exactly, including NULLs
    last."""
    n = 3000
    rows = [(i, None if i % 11 == 0 else f"P{(i * 7) % 5}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, pri string")
    order = [F.col("pri").desc_nulls_last(), F.col("id")]
    bucket_by = F.when(F.col("pri").isNull(), F.lit(2**33).cast("bigint")).otherwise(
        -string_order_key(F.col("pri"))
    )
    k = global_row_number(
        df, order, bucket_by=bucket_by, spread_by=F.col("id"), out_col="rnk"
    )
    got = {r.id: r.rnk for r in k.collect()}
    w = Window.orderBy(*order)
    want = {r.id: r.rnk for r in df.withColumn("rnk", F.row_number().over(w)).collect()}
    assert got == want
