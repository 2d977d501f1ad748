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


def test_kinesis_connector_option_mapping():
    """The reference's shard-iterator rule (kinesis_logs_reader.py:68-77)
    as connector options, pinned as a pure mapping (VERDICT r8 item 7):
    no start_time -> LATEST; start_time -> AT_TIMESTAMP + ISO timestamp;
    caller options pass through verbatim and win over derived ones."""
    from datetime import datetime

    from kinesis_logs_reader_spark.reader import connector_options

    assert connector_options("mystream", None) == {
        "streamName": "mystream",
        "startingPosition": "LATEST",
    }

    t = datetime(2020, 1, 2, 3, 4, 5)
    opts = connector_options("mystream", t)
    assert opts["startingPosition"] == "AT_TIMESTAMP"
    assert opts["startingTimestamp"] == "2020-01-02T03:04:05"
    assert opts["streamName"] == "mystream"

    # explicit caller choice beats the derived default
    opts = connector_options(
        "mystream", None, {"startingPosition": "TRIM_HORIZON", "region": "x"}
    )
    assert opts["startingPosition"] == "TRIM_HORIZON"
    assert opts["region"] == "x"


def test_kinesis_connector_route_builds_streaming_reader(
    spark, envelope_dir, monkeypatch
):
    """kinesis_options= must take the readStream.format("kinesis") route
    with every option landing verbatim, and the resulting frame must be
    STREAMING. No connector exists in this sandbox, so the stream
    reader is intercepted at the DataStreamReader boundary and fed a
    real binaryFile stream of CWL envelope blobs — everything downstream
    (decode, typing) is the production path."""
    from datetime import datetime

    from pyspark.sql import types as T
    from pyspark.sql.streaming import readwriter as srw

    from kinesis_logs_reader_spark.reader import KinesisLogsReader

    captured: dict = {}
    orig_format = srw.DataStreamReader.format
    orig_option = srw.DataStreamReader.option
    orig_load = srw.DataStreamReader.load

    def fake_format(self, fmt):
        if fmt == "kinesis":
            captured["format"] = fmt
            self._klrs_kinesis = True
            fmt = "binaryFile"
        return orig_format(self, fmt)

    def fake_option(self, k, v):
        if getattr(self, "_klrs_kinesis", False):
            captured.setdefault("options", {})[k] = v
            return self
        return orig_option(self, k, v)

    def fake_load(self, path=None, **kw):
        if getattr(self, "_klrs_kinesis", False):
            schema = T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("modificationTime", T.TimestampType()),
                    T.StructField("length", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            )
            df = (
                spark.readStream.format("binaryFile")
                .schema(schema)
                .option("pathGlobFilter", "*.gz")
                .option("recursiveFileLookup", "true")
                .load(envelope_dir)
            )
            return df.select(F.col("content").alias("data"))
        return orig_load(self, path, **kw)

    monkeypatch.setattr(srw.DataStreamReader, "format", fake_format)
    monkeypatch.setattr(srw.DataStreamReader, "option", fake_option)
    monkeypatch.setattr(srw.DataStreamReader, "load", fake_load)

    reader = KinesisLogsReader(
        "mystream",
        start_time=datetime(2020, 1, 2, 3, 4, 5),
        spark=spark,
        kinesis_options={"region": "us-east-1"},
    )

    assert captured["format"] == "kinesis"
    assert captured["options"]["streamName"] == "mystream"
    assert captured["options"]["startingPosition"] == "AT_TIMESTAMP"
    assert captured["options"]["startingTimestamp"] == "2020-01-02T03:04:05"
    assert captured["options"]["region"] == "us-east-1"
    assert reader.to_df().isStreaming
