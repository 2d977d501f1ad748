"""r15 optimization tests: parquet aggregate pushdown in the q131
family (VERDICT r14 item 4) and the load_table_v2 reader.

The profile's COUNT/numeric-MIN/MAX branch must be answered from
parquet footer statistics (PushedAggregation in the V2 scan node) —
and the restructured plan must compute exactly the values the old
single wide aggregate computed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators.sqlsurface import (
    _PROFILE_COLS,
    q131_table_profile,
    q131c_table_profile_kmv,
)
from kinesis_logs_reader_spark.sources.tables import load_table, load_table_v2

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "100000")  # default 100 truncates the pushed list
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def test_q131_pushes_aggregates(spark):
    plan = _plan(q131_table_profile(spark, SF_DIR))
    assert "PushedAggregation: [COUNT(*)" in plan
    # numeric min/max pushed alongside the counts
    assert "MIN(o_orderkey)" in plan and "MAX(o_totalprice)" in plan


def test_q131c_pushes_aggregates(spark):
    assert "PushedAggregation: [COUNT(*)" in _plan(
        q131c_table_profile_kmv(spark, SF_DIR)
    )


def test_q131_values_match_exact_recompute(spark):
    """The pushed/scan split must reproduce the old wide aggregate's
    values exactly (footer stats are exact for these files)."""
    rows = {r["column_name"]: r for r in q131_table_profile(spark, SF_DIR).collect()}
    orders = load_table(spark, sf_dir=SF_DIR, name="orders")
    for c in _PROFILE_COLS:
        exact = orders.agg(
            F.sum(F.col(c).isNull().cast("int")).alias("nulls"),
            F.min(c).cast("string").alias("mn"),
            F.max(c).cast("string").alias("mx"),
            F.count_distinct(F.col(c).cast("string")).alias("nd"),
        ).collect()[0]
        got = rows[c]
        assert got["n_nulls"] == exact["nulls"], c
        assert got["min_str"] == exact["mn"], c
        assert got["max_str"] == exact["mx"], c
        assert got["n_distinct"] == exact["nd"], c


def test_load_table_v2_restores_conf_and_separate_cache(spark):
    key = "spark.sql.sources.useV1SourceList"
    before = spark.conf.get(key)
    v2 = load_table_v2(spark, SF_DIR, "orders")
    assert spark.conf.get(key) == before, "useV1SourceList must be restored"
    v1 = load_table(spark, SF_DIR, "orders")
    assert v2 is not v1
    # V2-ness is what enables the pushdown: a count-only agg over the
    # v2 frame must show PushedAggregation; over the v1 frame it must not
    assert "PushedAggregation" in _plan(v2.agg(F.count(F.lit(1))))
    assert "PushedAggregation" not in _plan(v1.agg(F.count(F.lit(1))))
    # cache hit returns the same object
    assert load_table_v2(spark, SF_DIR, "orders") is v2
