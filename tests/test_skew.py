"""Salted aggregation: result parity with a direct groupBy, and the
two-phase plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators.skew import salted_agg
from kinesis_logs_reader_spark.plans import explain
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_salted_agg_matches_direct(spark):
    ev = load_table(spark, SF_DIR, "events")
    salted = salted_agg(
        ev,
        "event_type",
        {"cnt": ("event_id", "count"), "vmin": ("value", "min"), "vmax": ("value", "max")},
        n_salts=8,
    )
    direct = ev.groupBy("event_type").agg(
        F.count("event_id").alias("cnt"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    got = {r.event_type: (r.cnt, r.vmin, r.vmax) for r in salted.collect()}
    want = {r.event_type: (r.cnt, r.vmin, r.vmax) for r in direct.collect()}
    assert got == want


def test_salted_agg_two_phase_plan(spark):
    """Salting must produce two aggregation phases over different keys."""
    ev = load_table(spark, SF_DIR, "events")
    salted = salted_agg(ev, "event_type", {"cnt": ("event_id", "count")}, n_salts=8)
    plan = explain.formatted_plan(salted)
    # phase 1 keyed by (event_type, _salt), phase 2 by event_type only
    assert "_salt" in plan
    assert plan.count("HashAggregate") >= 3  # partial+final per phase


def test_salted_agg_rejects_non_algebraic(spark):
    ev = load_table(spark, SF_DIR, "events")
    try:
        salted_agg(ev, "event_type", {"m": ("value", "avg")})
        assert False, "avg must be rejected (not salt-decomposable as-is)"
    except ValueError:
        pass


def test_salted_join_matches_plain_join(spark):
    """Salted join == plain join on heavily skewed data (90% one key)."""
    from kinesis_logs_reader_spark.operators.skew import salted_join

    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    got = salted_join(fact, dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.min("w").alias("w")
    )
    want = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.min("w").alias("w")
    )
    assert got.exceptAll(want).count() == 0 and got.count() == want.count()


def test_salted_join_deterministic_salt(spark):
    """md5 salt must be stable across executions (speculation-safe)."""
    from kinesis_logs_reader_spark.operators.skew import salted_join

    fact = spark.range(0, 1000).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    a = salted_join(fact, dim, "k").count()
    b = salted_join(fact, dim, "k").count()
    assert a == b == 1000
