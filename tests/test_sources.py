"""Source/sink surface: TSV sink (A3) golden bytes, JSON-lines source
(A4), and distributed TSV write."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.sources import sinks
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_tsv_string_golden(spark):
    """A3: sorted columns, header first, tab-joined — golden bytes."""
    df = spark.createDataFrame(
        [(2, "b", None), (1, "a", 1.5)], "zcol int, acol string, mcol double"
    )
    got = sinks.tsv_string(df.orderBy("zcol"))
    assert got == "acol\tmcol\tzcol\na\t1.5\t1\nb\t\t2"


def test_write_tsv_distributed(spark, tmp_path):
    """A3 distributed: part files carry header + sorted columns."""
    df = load_table(spark, SF_DIR, "region")
    out = str(tmp_path / "region_tsv")
    sinks.write_tsv(df, out, single_file=True)
    [part] = glob.glob(out + "/part-*.csv")
    lines = open(part).read().splitlines()
    assert lines[0] == "r_name\tr_regionkey"
    assert len(lines) == 6  # header + 5 regions


def test_json_lines_source(spark, tmp_path):
    """A4: round-trip events through JSON lines and re-ingest with an
    explicit schema (schema-on-read, no inference pass at scale)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value", "props"
    )
    path = str(tmp_path / "events_jsonl")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id long, event_type string, value double, props string").json(path)
    assert back.count() == ev.count()
    a = ev.orderBy("event_id").collect()
    b = back.orderBy("event_id").collect()
    assert [r.event_id for r in a] == [r.event_id for r in b]
    assert [r.props for r in a] == [r.props for r in b]


def test_json_props_parse_typed(spark):
    """from_json over the props column -> typed struct column."""
    ev = load_table(spark, SF_DIR, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    got = {r.event_id: r.k for r in parsed.limit(50).collect()}
    assert all(isinstance(v, int) for v in got.values())


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink: typed round-trip of a lineitem slice (the other
    columnar format Spark ships natively; same pushdown machinery)."""
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_orderkey") < 100)
    path = str(tmp_path / "li_orc")
    li.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source with explicit schema: the TSV sink's output reads
    back losslessly (header + sep + schema contract)."""
    cust = (
        load_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .filter(F.col("c_custkey") < 200)
    )
    path = str(tmp_path / "cust_tsv")
    cust.write.option("sep", "\t").option("header", True).csv(path)
    back = (
        spark.read.schema("c_custkey bigint, c_name string, c_mktsegment string")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )
    assert back.count() == cust.count()
    assert back.exceptAll(cust).count() == 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Data-lake reality: files written before a column existed must
    read alongside newer files (mergeSchema; missing values -> NULL)."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.parquet(path + "/batch=1")
    spark.createDataFrame(
        [(3, "c", 0.5)], "id bigint, name string, score double"
    ).write.parquet(path + "/batch=2")
    df = spark.read.option("mergeSchema", True).parquet(path)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 0.5}


def test_ignore_corrupt_files(spark, tmp_path):
    """A torn/garbage file in the directory must not kill the 100 TB
    scan when ignoreCorruptFiles is on; good files still read fully."""
    import os

    path = str(tmp_path / "with_junk")
    good = load_table(spark, SF_DIR, "region")
    good.write.parquet(path)
    with open(os.path.join(path, "part-junk.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    df = spark.read.option("ignoreCorruptFiles", True).parquet(path)
    assert df.count() == good.count()
