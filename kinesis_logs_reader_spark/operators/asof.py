"""As-of (temporal) join — a custom operator Spark lacks natively.

Implemented as the scalable union+window composition, NOT a range-join
explosion:

1. tag both sides and union them (schema-aligned),
2. one shuffle: partition by key, order by (event time, side-rank),
3. each right-side row picks ``last_value(..., ignorenulls)`` of the
   left side — the most recent left row at-or-before its timestamp.

Cost: one shuffle + one window sort over |L|+|R| rows, independent of
match fan-out — at 100 TB this is the only as-of formulation that
doesn't risk a quadratic intermediate. Left rows at exactly the right
row's timestamp DO match (``<=`` semantics), so the left side sorts
before the right at equal timestamps.

Determinism: callers must ensure at most one left row per (key, time)
— dedup with max-id first — otherwise "the" most recent row is
ambiguous (DuckDB's native ASOF JOIN has the same caveat).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each right row: columns of the latest left row with
    ``left_ts <= right_ts`` on the same key (null if none)."""
    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c) for c in right.columns],
    )
    lhs_aligned = lhs.select(
        "_k", "_t", "_side",
        *[F.col(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right.columns],
    )
    unioned = lhs_aligned.unionByName(rhs)
    # left rows sort before right rows at equal _t -> `<=` semantics
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return matched.filter(F.col("_side") == 1).select(
        *right.columns, *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def q62_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the same user's most
    recent click at-or-before it. Oracle: DuckDB's native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        # one row per (user, ts): max event_id — asof needs unique times
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
    )
    return (
        out.select(
            "purchase_id",
            "user_id",
            F.col("ts").cast("string").alias("purchase_ts"),
            F.col("asof_click_id").alias("click_id"),
        )
        .orderBy("purchase_id")
    )


def q173_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample + forward-fill (r8): each user's 'purchase' gauge
    value re-sampled onto a fixed hourly grid with last-observation-
    carried-forward — the canonical telemetry/feature-store gap-fill
    (a model-serving feature table wants one row per (entity, slot),
    not ragged event times). Users bounded to user_id < 10 by
    contract (the evaluation slice); the grid is the fixed January
    2024 hourly spine (720 slots).

    Same scalable composition as asof_join — grid spine and events
    tagged and UNIONed, ONE shuffle partitioned by user ordered by
    (ts, side-rank, event_id), ``last(ignorenulls)`` carries the
    value forward — never a per-slot range join (fan-out-independent;
    at 100 TB the spine is entities x slots, generated map-side by
    ``sequence``, and the window state is one value per user). Slots
    before a user's first purchase stay NULL (no back-fill), slots at
    an event's exact timestamp take it (<= semantics: events sort
    before grid points at equal ts); equal-ts events tie-break by
    event_id (the asof_join determinism contract).

    Oracle: identical union + IGNORE NULLS window in DuckDB; values
    carried verbatim (both engines read the same parquet doubles —
    no cross-engine float arithmetic at all).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("user_id") < 10) & (F.col("event_type") == "purchase"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("is_grid"),
            "event_id",
            "value",
        )
    )
    users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id")
        .distinct()
    )
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                F.expr("interval 1 hour"),
            )
        ).alias("ts"),
        F.lit(1).alias("is_grid"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.unionByName(grid)
        .withColumn("val", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("ts").alias("slot_ts"), "val")
        .orderBy("user_id", "slot_ts")
    )


def q182_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (r8): credit each purchase to the user's
    most recent click-or-view within the 24 h before it (same-instant
    touches count — asof <= semantics), else 'direct'; report per
    channel: purchases, exact revenue, and share — the marketing
    rollup every event pipeline serves.

    Same fan-out-free composition as q173: touches and purchases
    UNIONed, ONE user-partitioned window where the carried state is an
    ATOMIC struct last((ts, type), ignorenulls) — carrying ts and type
    in separate windows could tear under equal-ts ties; the struct
    can't. Tie order (ts, side-rank, event_id), the q173 contract.
    Revenue sums as DECIMAL(18,2) — the q142 convention — so the
    cross-engine aggregate is exact, never a float-order hazard.
    """
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_p"),
        "event_id",
        F.col("event_type").alias("ttype"),
        F.lit(None).cast("double").alias("value"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
        "event_id",
        F.lit(None).cast("string").alias("ttype"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = touches.unionByName(purch).withColumn(
        "lt",
        F.last(
            F.when(F.col("is_p") == 0, F.struct("ts", "ttype")),
            ignorenulls=True,
        ).over(w),
    )
    attributed = (
        carried.filter(F.col("is_p") == 1)
        .select(
            F.when(
                F.col("lt").isNotNull()
                & (F.col("lt.ts") >= F.expr("ts - interval 24 hours")),
                F.col("lt.ttype"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
    )
    total = attributed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "channel",
            "n_purchases",
            "revenue",
            F.expr("(n_purchases * 1000000L) div n_total").alias("share_ppm"),
        )
        .orderBy("channel")
    )
