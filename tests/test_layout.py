"""Storage layout: partition pruning must reach the scan, and
compaction must reduce file counts without changing data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.plans import explain
from kinesis_logs_reader_spark.sources import layout
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    layout.write_partitioned(
        load_table(spark, SF_DIR, "orders"),
        out,
        derive={"o_year": F.year("o_orderdate")},
    )
    # hive-style dirs exist
    assert glob.glob(out + "/o_year=*")

    df = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = explain.formatted_plan(df)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]

    want = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == want > 0


def test_compaction(spark, tmp_path):
    out = str(tmp_path / "fragmented")
    src = load_table(spark, SF_DIR, "orders")
    src.repartition(37).write.mode("overwrite").parquet(out)
    assert len(glob.glob(out + "/part-*.parquet")) == 37

    n = layout.compact(spark, out, target_files=4)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) <= 4
    assert spark.read.parquet(out).count() == n == src.count()
