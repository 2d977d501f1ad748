"""Batch analogs of the streaming window operators (SURVEY.md §2.2 H1-H3).

The same ``window`` / ``session_window`` expressions run unchanged on a
streaming DataFrame (see :mod:`kinesis_logs_reader_spark.streaming.jobs`);
running them in batch makes them oracle-checkable against DuckDB
(``time_bucket`` / gaps-and-islands SQL). Event-time semantics are
identical; only triggers/watermarks differ, and those are exercised in
tests/test_streaming.py.

Scale: window aggregation is a single hash-agg keyed by (window, key) —
map-side combinable, no sort. Session windows shuffle once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.sources.tables import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def q31_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: 5-minute tumbling window counts + exact sums per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("ws"),
            "event_type",
            "cnt",
            "sum_value",
        )
        .orderBy("ws", "event_type")
    )


def q32_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: 10-minute windows sliding by 5 — each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("string").alias("ws"), "event_type", "cnt")
        .orderBy("ws", "event_type")
    )


def q33_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: 30-minute-gap session windows per user.

    Spark merges an event into the current session iff
    ``ts < last_ts + gap``; the DuckDB oracle reproduces that with a
    gaps-and-islands window (new session when ``diff >= gap``).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            "n_events",
        )
        # session-window agg already clusters on user_id and sorts by
        # (user_id, session start); per-partition sort keeps that order
        # without the range exchange a global ORDER BY would add
        .sortWithinPartitions("user_id", "session_start")
    )


def q142_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9's stream-stream interval join as an oracle-checkable batch
    twin (same discipline as q31-q33 for H1-H3): purchases within 60
    minutes after the same user's signup, aggregated per user to a
    bounded summary. The join predicate is the exact condition
    ``jobs.h9_stream_stream_join`` runs under watermarks — the
    event-time bound on BOTH ends is what lets streaming state GC; in
    batch the same bound is what keeps the join a band join instead of
    a per-user cross product.

    Scale shape (r11 weak-row audit): the band condition is bucketed
    — signups duplicate into their two covering hour buckets, the
    join is an EQUI-join on (user_id, bucket) with the exact band as
    a residual filter. Each qualifying pair meets in exactly ONE
    bucket (the purchase's own), so no dedup is needed and the pair
    set is identical. This replaces the per-user mini cross product
    (and the optimizer's fact-side broadcast) with comparisons
    bounded per (user, hour) — the standard range-join optimization,
    and the only shape that survives a user with months of events at
    100 TB. SHUFFLE_HASH pinned: both sides are fact-sized, sorting
    them for SMJ measured slower (A/B at sf~1: shipped 0.53 s ->
    bucketed 0.39 s -> bucketed SHJ 0.32 s join core, identical 37400
    pairs; PERF.md r11). The per-user aggregate bounds the output at
    |users| rows at any event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = lambda c: (F.unix_timestamp(c) / 3600).cast("long")  # noqa: E731
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
        .withColumn("sb", F.explode(F.array(hour("s_ts"), hour("s_ts") + 1)))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("amount"),
        )
        .withColumn("pb", hour("p_ts"))
    )
    joined = signups.hint("SHUFFLE_HASH").join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("sb") == F.col("pb"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 60 MINUTES")),
    )
    return (
        joined.groupBy(F.col("s_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(_dec("amount")), 2).cast("double").alias("sum_amount"),
            F.min(F.col("p_ts").cast("string")).alias("first_p_ts"),
            F.max(F.col("p_ts").cast("string")).alias("last_p_ts"),
        )
        .orderBy("user_id")
    )
