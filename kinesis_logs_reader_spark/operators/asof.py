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
