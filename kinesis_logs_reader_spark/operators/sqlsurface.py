"""SQL-surface operators: UNPIVOT, LATERAL join, recursive CTE.

These run through ``spark.sql`` against registered views — the engine's
second entry path next to the DataFrame API (SURVEY.md §3.4: batch
queries are plain Spark SQL against temp views). Each exercises a SQL
feature users of a full engine expect:

- q86 UNPIVOT: wide->long reshaping of an aggregate table (inverse of
  q53's PIVOT). Unpivot is a zero-shuffle Expand node over the (tiny)
  aggregate output.
- q87 JOIN LATERAL: correlated top-N per group. Catalyst decorrelates
  the LIMITed lateral subquery into a window-rank plan — same shape a
  hand-written row_number() query compiles to, proving the
  decorrelation path rather than bypassing it.
- q88 recursive CTE (Spark 4): calendar densification — a date spine
  over the events range, left-joined to daily counts so zero-activity
  days surface. The recursion depth equals the spine length (bounded,
  driver-side plan growth), and the join against it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.sources.tables import (
    load_table,
    load_table_v2,
    spread_scan,
)

# The six orders columns every q131-family profile covers, and the
# split that parquet footer statistics can answer without reading data
# (guide §6 / VERDICT r14 item 4): COUNT(*) and COUNT(col) push for
# every type (null counts live in the footer), MIN/MAX push only for
# statistics-typed columns (bigint, double) — string and timestamp_ntz
# MIN/MAX must still scan, and ONE non-pushable aggregate in a list
# disables the whole pushdown, hence two branches.
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
_PROFILE_PUSHED_MINMAX = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_SCAN_MINMAX = ("o_orderstatus", "o_orderdate", "o_orderpriority")


def _profile_minmax_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (column_name, n_nulls, min_str, max_str) stack shared by
    q131 and q131c, restructured (r15) so the eligible aggregates sit
    directly on a V2 scan and become a METADATA read:

    - pushed branch: COUNT(*) + COUNT(col) x6 + MIN/MAX of the three
      numeric columns — `PushedAggregation` in the scan node, zero
      data pages read (DuckDB answers the same profile from zone maps;
      this is Spark's equivalent). n_nulls = COUNT(*) - COUNT(col),
      exactly the old SUM(isNull) value.
    - scan branch: MIN/MAX of the two strings + the timestamp — a
      3-column projected scan (was 6 columns before the split).

    Both branches are 1-row frames; the cross join is trivially
    broadcast. Values (and therefore the oracle hash) are identical to
    the old single wide aggregate — only where they're computed moved.
    """
    pushed_aggs = [F.count(F.lit(1)).alias("_n_total")]
    pushed_aggs += [F.count(c).alias(f"{c}__nn") for c in _PROFILE_COLS]
    for c in _PROFILE_PUSHED_MINMAX:
        pushed_aggs += [
            F.min(c).alias(f"{c}__minv"),
            F.max(c).alias(f"{c}__maxv"),
        ]
    pushed = load_table_v2(spark, sf_dir, "orders").agg(*pushed_aggs)
    scan_aggs = []
    for c in _PROFILE_SCAN_MINMAX:
        scan_aggs += [
            F.min(c).alias(f"{c}__minv"),
            F.max(c).alias(f"{c}__maxv"),
        ]
    scanned = load_table(spark, sf_dir, "orders").agg(*scan_aggs)
    wide = pushed.crossJoin(F.broadcast(scanned)).select(
        *[
            (F.col("_n_total") - F.col(f"{c}__nn")).alias(f"{c}__nulls")
            for c in _PROFILE_COLS
        ],
        *[
            F.col(f"{c}__minv").cast("string").alias(f"{c}__min")
            for c in _PROFILE_COLS
        ],
        *[
            F.col(f"{c}__maxv").cast("string").alias(f"{c}__max")
            for c in _PROFILE_COLS
        ],
    )
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, min_str, max_str)"
        )
    )


def q86_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT per-status order metrics from wide to long."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH wide AS (
          SELECT o_orderstatus,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
                 CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_orders
          FROM orders
          GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, metric, val
        FROM wide
        UNPIVOT (val FOR metric IN (total_price, max_price, n_orders))
        ORDER BY o_orderstatus, metric
        """
    )


def q87_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation via a correlated LATERAL subquery."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, t.c_custkey,
               CAST(ROUND(CAST(t.c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal
        FROM nation
        JOIN LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        ORDER BY n_name, t.c_custkey
        """
    )


def q88_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date spine + left join: every day of the event
    window appears, zero-activity days included (calendar
    densification)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '2024-01-01'
          UNION ALL
          SELECT DATE_ADD(d, 1) FROM spine WHERE d < DATE '2024-01-30'
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt
          FROM events
          GROUP BY CAST(ts AS DATE)
        )
        SELECT CAST(spine.d AS STRING) AS day, COALESCE(daily.cnt, 0) AS n_events
        FROM spine LEFT JOIN daily ON spine.d = daily.d
        ORDER BY day
        """
    )


def q131_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level table profiling of orders — the DESCRIBE/df.summary
    surface as an oracle-checkable query: per column, null count, exact
    distinct count, and min/max rendered to strings.

    Two jobs, NO Expand: six COUNT(DISTINCT) columns in one aggregate
    trigger Catalyst's expand-based rewrite (6 copies of every input
    row through the distinct shuffle — measured 4.0 s at sf0.1). Here
    (1) nulls/min/max ride one ordinary stacked aggregate (map-side
    combinable, single scan, no expand), and (2) the distinct counts
    go through ONE unpivoted two-phase aggregate: per-row (column,
    value-string) structs -> groupBy(column, value) -> per-column
    count. Same 6x row fan-out as Expand but through a combinable
    pre-aggregation instead of a raw 6x shuffle: 1.1 s at sf0.1.
    Values are distinct-counted on their STRING rendering — injective
    for every type here (Spark casts render round-trip), so the count
    equals the native COUNT(DISTINCT), which the DuckDB oracle
    computes natively. At 100 TB the exact distinct rows switch to
    approx_count_distinct — the q28 pattern — making the whole profile
    a single scan again.

    r15 (guide §6): the nulls/min/max branch is `_profile_minmax_base`
    — COUNTs and numeric MIN/MAX answered from parquet footer
    statistics via a V2 pushed aggregate (the scan node shows
    PushedAggregation, zero data pages read; DuckDB's zone-map profile
    path, which is why its side reads in ~0.1 s), with only the
    string/timestamp MIN/MAX left on a (3-column) scan. Values are
    identical to the old single wide aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = _profile_minmax_base(spark, sf_dir)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("v"),
            )
            for c in _PROFILE_COLS
        ]
    )
    # spread_scan: the 6-way struct render + explode is per-row-heavy
    # work pinned to the scan's single task by the one-row-group file
    # layout (guide §2.5); the exchange is gated on scan splits vs
    # cores, so at real scale it vanishes (sources/tables.py).
    dist = (
        spread_scan(orders)
        .select(F.explode(pairs).alias("e"))
        .select("e.column_name", "e.v")
        .filter(F.col("v").isNotNull())  # COUNT(DISTINCT) ignores NULL
        .groupBy("column_name", "v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(F.broadcast(dist), "column_name")
        .select("column_name", "n_nulls", "n_distinct", "min_str", "max_str")
        .orderBy("column_name")
    )


def q131b_table_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q131's production twin (the q45b/q151b/q189b convention, r11)
    — the single-scan sketch profile q131's own docstring commits to
    at 100 TB: per column, null count, min/max, and an HLL
    approx_count_distinct, ALL riding one ordinary stacked aggregate
    (map-side combinable, no Expand, no second unpivot pass — the
    sketch is a regular aggregate, which is the whole point of the
    swap). The exact unpivot pass from q131 is retained ONLY to
    certify the sketch in-query: the emitted column is the q28
    tolerance boolean (each engine's own approx within 12% of its own
    exact), the established cross-engine form for sketches whose bit
    patterns legitimately differ between engines.

    At 100 TB the audit pass is dropped and the profile is ONE scan;
    q131 stays the declared exact surface.
    """
    orders = load_table(spark, sf_dir, "orders")
    specs = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ]
    aggs = []
    for c, _t in specs:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.approx_count_distinct(c).alias(f"{c}__apx"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__min, {c}__max, {c}__apx"
        for c, _t in specs
    )
    base = wide.select(
        F.expr(
            f"stack({len(specs)}, {stack_args}) AS "
            "(column_name, n_nulls, min_str, max_str, apx)"
        )
    )
    # audit-only exact pass (q131's unpivoted two-phase distinct)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("v"),
            )
            for c, _t in specs
        ]
    )
    # spread_scan: same single-task-scan parallelization as q131 (the
    # audit branch is the expensive half of this query by design)
    dist = (
        spread_scan(orders)
        .select(F.explode(pairs).alias("e"))
        .select("e.column_name", "e.v")
        .filter(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(F.broadcast(dist), "column_name")
        .select(
            "column_name",
            "n_nulls",
            "min_str",
            "max_str",
            (
                F.abs(F.col("apx") - F.col("n_distinct"))
                <= 0.12 * F.col("n_distinct")
            ).alias("approx_within_12pct"),
        )
        .orderBy("column_name")
    )


# q131c sketch geometry: M md5-keyed substreams, values on a 2^44 grid
# (11 hex chars). S*M*M = 2^60 and M*S = 2^52 both fit signed int64.
_KMV_PROFILE_BUCKETS = 256  # stderr ~ 1/sqrt(M) ~ 6%
_KMV_PROFILE_SCALE = 1 << 44


def q131c_table_profile_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION half of the profile family, declared and
    hash-green on its own (VERDICT r12 item 4): q131b as declared
    still carries q131's exact unpivot branch to certify the HLL —
    so at sf~1 the "sketch twin" costs MORE than exact q131. This
    query is the 0.4 s path a 100 TB profile actually runs: nulls /
    min / max from one stacked native-type aggregate, and the
    distinct-count column from a DETERMINISTIC sketch — so unlike
    engine-internal HLL bit patterns, every output value is
    bit-identical cross-engine and the driver hashes the ESTIMATES
    themselves, no exact branch anywhere in the plan.

    The sketch (PCSA-style stochastic averaging over md5 substreams):
    each value's canonical rendering is md5-hashed once; the first 13
    hex chars parse to a 52-bit word w whose LOW byte picks one of
    M=256 substreams and whose high 44 bits are the grid value u
    (one parse per row — the split is integer arithmetic, and
    min(w) within a substream is min(u) shifted since the low byte
    is constant inside the group). Per (column, substream) only
    MIN survives — a
    map-side-combinable aggregate whose state is M int64s per column,
    the fixed-memory property that makes the profile a single
    corpus-scale pass with a <= 6*M-row shuffle. Estimator, all
    deterministic arithmetic:
      f < M  (some substream empty): linear counting,
             round(-M * ln((M - f) / M)) — f is an exact integer and
             the 255 possible ln inputs were checked offline: the
             closest result sits 4.9e-3 from a rounding boundary, ten
             orders above any libm 1-ulp divergence, so the floor is
             cross-engine stable.
      f = M  (all substreams hit): min-value estimator
             S*M*M div (sum of mins) - M — pure int64 division.
    Accuracy is profile-grade and documented: stderr ~ 1/sqrt(M) ~ 6%
    plus a -M absolute bias term at huge n and up to ~-17% in the
    narrow f ~ M crossover band (tested against exact at sf0.01).

    Canonical renderings (the md5 INPUT must match byte-for-byte in
    DuckDB, where raw double/timestamp casts differ): bigints and
    strings render as-is; 2-decimal money renders as integer cents
    floor(v*100 + 0.5); timestamps render as epoch seconds. Injective
    per column, so distinct renderings == distinct values.

    r15: the nulls/min/max branch rides `_profile_minmax_base` (V2
    pushed aggregate — footer statistics, no data pages — plus a
    3-column scan for the string/timestamp extremes); see q131. The
    sketch branch below is untouched.

    Reference analog: none (beyond-reference mandate; q131 family).
    """
    orders = load_table(spark, sf_dir, "orders")
    m = _KMV_PROFILE_BUCKETS
    s = _KMV_PROFILE_SCALE
    specs = [
        ("o_orderkey", "cast(o_orderkey as string)"),
        ("o_custkey", "cast(o_custkey as string)"),
        ("o_orderstatus", "o_orderstatus"),
        (
            "o_totalprice",
            "cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) as string)",
        ),
        # NTZ cannot cast straight to long; session TZ is UTC so the
        # NTZ->TZ hop is identity and unix_seconds == DuckDB epoch()
        (
            "o_orderdate",
            "cast(unix_seconds(cast(o_orderdate as timestamp)) as string)",
        ),
        ("o_orderpriority", "o_orderpriority"),
    ]
    base = _profile_minmax_base(spark, sf_dir)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.expr(r).alias("v"),
            )
            for c, r in specs
        ]
    )
    # ONE hex parse per row (conv is the measured per-row cost: the
    # two-conv split read 1.70 s at sf~1 vs 1.26 s for conv13 + int
    # split; the r13 A/B ledger in PERF.md covers the rejected
    # alternatives — string-min keys 2.35, ascii-arithmetic parse
    # 2.82, fused single-int group key 1.39). w's low byte is the
    # substream, the high 44 bits are the grid value; min(w) within a
    # substream equals min(w div 256) shifted, since the low byte is
    # constant inside the group.
    # spread_scan (r14): the md5-per-value sketch chain was pinned to
    # the scan's single task (one-row-group file); measured 1.56 s ->
    # 0.47 s at sf0.1 behind the gated round-robin exchange. The
    # substream MIN aggregate is order-insensitive, so the result is
    # partitioning-independent (guide §2.5).
    hashed = (
        spread_scan(orders)
        .select(F.explode(pairs).alias("e"))
        .select("e.column_name", F.md5("e.v").alias("h"))
        .filter(F.col("h").isNotNull())  # COUNT(DISTINCT) ignores NULL
        .select(
            "column_name",
            F.conv(F.substring("h", 1, 13), 16, 10).cast("long").alias("w"),
        )
    )
    est = (
        hashed.groupBy("column_name", (F.col("w") % m).alias("b"))
        .agg(F.expr(f"min(w) div {m}L").alias("u_min"))
        .groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("f"),
            F.sum("u_min").alias("su"),
        )
        .select(
            "column_name",
            F.when(
                F.col("f") < m,
                F.floor(
                    -F.lit(m)
                    * F.log((F.lit(m) - F.col("f")) / F.lit(m))
                    + F.lit(0.5)
                ),
            )
            .otherwise(
                F.expr(
                    f"{s}L * {m}L * {m}L div "
                    f"(su + ({m}L - f) * {s}L) - {m}L"
                )
            )
            .cast("bigint")
            .alias("n_distinct_est"),
        )
    )
    return (
        base.join(F.broadcast(est), "column_name")
        .select(
            "column_name", "n_nulls", "n_distinct_est", "min_str", "max_str"
        )
        .orderBy("column_name")
    )
