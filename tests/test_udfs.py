"""J-surface tests: grouped-agg pandas UDF, applyInPandas grouped map,
SQL-registered UDFs — each validated against an independent computation."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import udfs
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_grouped_agg_median_matches_pandas(spark):
    got = {
        r.c_mktsegment: r.median_price
        for r in udfs.median_order_price_per_segment(spark, SF_DIR).collect()
    }
    cust = load_table(spark, SF_DIR, "customer").toPandas()
    orders = load_table(spark, SF_DIR, "orders").toPandas()
    merged = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    want = merged.groupby("c_mktsegment")["o_totalprice"].median().to_dict()
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_apply_in_pandas_zscore(spark):
    out = udfs.zscore_orders_per_customer(spark, SF_DIR)
    # z-scores within each customer must have ~zero mean
    agg = out.groupBy("o_custkey").agg(
        F.round(F.avg("zscore"), 6).alias("mu"), F.count(F.lit(1)).alias("n")
    )
    bad = agg.filter((F.col("n") > 1) & (F.abs(F.col("mu")) > 1e-6))
    assert bad.count() == 0
    assert out.count() == load_table(spark, SF_DIR, "orders").count()


def test_sql_registered_udfs(spark):
    udfs.register_sql_udfs(spark)
    blob = gzip.compress(b"hello sql udf")
    df = spark.createDataFrame([(blob, "a b c")], "data binary, text string")
    df.createOrReplaceTempView("raw_udf_test")
    [row] = spark.sql(
        "SELECT gunzip_str(data) AS s, n_tokens_py(text) AS n FROM raw_udf_test"
    ).collect()
    assert row.s == "hello sql udf" and row.n == 3
