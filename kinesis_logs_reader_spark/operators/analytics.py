"""Complex multi-join analytics (TPC-H-shaped; SURVEY.md §2.2 C/D/F).

The reference has no joins or aggregations at all (SURVEY.md §2.1,
kinesis_logs_reader.py:1-105 contains a single scan->filter->flatten->
project pipeline), so these queries define the engine's *composed*
relational surface: the classic TPC-H decision-support shapes
re-expressed over the driver's star schema. Each one is chosen to pin a
plan property that matters at 100 TB:

- q68 (Q3 shape): filter-before-join selectivity + top-N pushdown
  (TakeOrderedAndProject, never a global sort of the join output).
- q69 (Q5 shape): 6-table join where every dimension broadcasts and the
  only shuffles are fact-fact (orders join lineitem) and the final agg.
- q70 (Q10 shape): fact-fact join with a quarter-filtered probe side +
  broadcast dims; top-20 by revenue.
- q71 (Q18 shape): aggregate-then-join — the HAVING filter runs on the
  lineitem aggregate *before* any join, so the join probe side is 200
  keys, not 60k rows. At 100 TB this ordering is the difference between
  a broadcast probe and a full fact-fact shuffle.
- q72 (Q22 shape): scalar aggregate broadcast + decorrelated NOT EXISTS
  (anti join). The average-balance threshold is compared in exact
  decimal cross-multiplied form (bal * n > total) so both engines make
  bit-identical boundary decisions.
- q73 (Q2 shape): correlated per-group minimum decorrelated into one
  window pass (min over partition) + filter — no self-join, no
  re-aggregation shuffle.

Determinism per SURVEY.md §7.4: exact DECIMAL money math, ROUND(..,2)
-> DOUBLE on output, total ORDER BY ending in a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.operators.relational import (
    _c2,
    _d38,
    _dec,
    _money,
    _partials,
    _r2d,
    _rev4,
    _revenue,
)
from kinesis_logs_reader_spark.sources.tables import load_table


def _ts(lit: str):
    return F.expr(f"TIMESTAMP_NTZ '{lit} 00:00:00'")


def q68_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue, top 10.

    Filters reach the parquet scans (segment, two date ranges) before
    either join, and the lineitem revenue pre-aggregates per orderkey
    *before* touching orders (the group key is the join key, so
    aggregate-then-join is semantics-preserving and collapses the fact
    side map-side — measured 2.4x at sf~1 vs join-first). The top-10
    compiles to TakeOrderedAndProject — per-partition heaps + one
    driver merge, no global sort shuffle.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-06-01")
    )
    li_rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > _ts("1998-06-01"))
        .groupBy("l_orderkey")
        # rows per orderkey are bounded (<=7 at any sf): int64 1e-4-unit
        # sums cannot overflow, so no per-row decimal
        .agg(F.sum(_rev4()).alias("_rev"))
    )
    return (
        li_rev.join(orders, li_rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            _money(F.col("_rev"), 4).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
        .orderBy("l_orderkey")
    )


def q69_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where supplier and customer
    share the nation, one region, one year.

    region/nation/supplier are broadcast (dims stay small at any scale
    factor); the only data-sized shuffles are lineitem join orders and
    the final 25-group aggregation, which is map-side combined.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        # 25 unbounded groups: per-row int64 1e-4 units, decimal(38)
        # accumulator only in the aggregate (overflow-safe at any sf)
        .agg(_money(F.sum(_rev4().cast("decimal(38,0)")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q70_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter. Quarter filter lands on the orders scan; nation
    broadcasts; top-20 is TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # rows per (custkey, quarter) are bounded: int64-safe
            _money(F.sum(_rev4()), 4).alias("revenue"),
            _money(F.max(_c2("c_acctbal")), 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .orderBy("c_custkey")
    )


def q71_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250.

    Aggregate-then-join: the lineitem group-by + HAVING runs first and
    shrinks 60k rows to ~200 orderkeys; the subsequent joins probe with
    that small set (AQE turns them into broadcasts at runtime). Joining
    first and aggregating later would shuffle the full fact table twice.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_c2("l_quantity")).alias("_sumqty"))
        .filter(F.col("_sumqty") > 250 * 100)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            _money(_c2("o_totalprice"), 2).alias("totalprice"),
            _money(F.col("_sumqty"), 2).alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
        .orderBy("o_orderkey")
    )


def q72_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the average
    balance with no large order, grouped by nation.

    The global average arrives as a one-row broadcast (scalar-subquery
    decorrelation done explicitly); the NOT EXISTS is a left anti join
    against the filtered orders side. The threshold compare is exact
    cross-multiplied decimal — ``bal * n_pos > total`` — so no engine-
    specific float averaging can flip a boundary row.
    """
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_row = pos.agg(
        F.sum(_c2("c_acctbal")).alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(_c2("c_acctbal") * F.col("_n") > F.col("_total"))
        .join(
            big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _money(F.sum(_c2("c_acctbal")), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def q73_cheapest_lineitem_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the lineitem(s) selling it
    at that part's minimum extended price.

    The reference correlated form — ``price = (SELECT MIN(price) ...
    WHERE same part)`` — decorrelates into one window MIN over
    l_partkey plus a filter: a single shuffle on the group key, no
    self-join and no join-back of an aggregate. Equality on the double
    is safe: both engines compare the same stored parquet values.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("_minp", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_minp"))
        .select(
            "p_partkey",
            "p_name",
            "l_orderkey",
            "l_linenumber",
            _r2d(_dec("l_extendedprice")).alias("price"),
        )
        .orderBy("p_partkey", "l_orderkey", "l_linenumber")
    )


def q38_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of o_totalprice (data-profiling primitive).

    Bucketing is pure column arithmetic -> one map-side-combinable
    group-by of at most 10 groups; this is the shape every quality
    dashboard query should take at 100 TB (never collect-then-bin).
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).alias(
        "bucket"
    )
    return (
        orders.select(bucket, "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _r2d(F.min(_dec("o_totalprice"))).alias("lo"),
            _r2d(F.max(_dec("o_totalprice"))).alias("hi"),
        )
        .orderBy("bucket")
    )


def q39_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per order status (mode aggregate).

    count group-by then a row_number window over the small aggregate —
    the heavy input collapses before the window, so the window state is
    (n_statuses x n_priorities), not row-scale. Ties break on the
    priority string so both engines pick the same winner.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
        .orderBy("o_orderstatus")
    )


def q207_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjoint brand/size/quantity
    bands, OR'd together — the disjunctive-pushdown showcase.

    The WHERE is an OR of per-branch conjunctions mixing lineitem and
    part columns. Catalyst splits it: the OR of each side's own
    conjuncts is pushed to THAT scan (lineitem gets the quantity-range
    OR, part gets the brand+size OR — both visible as PushedFilters),
    while the full cross-table predicate evaluates after the join. At
    100 TB that pre-join pruning is the difference between joining
    every lineitem and joining ~2% of them. Branches are brand-disjoint
    so the per-branch report needs no overlap accounting.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & qty.between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & qty.between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#9")
        & F.col("p_size").between(1, 15)
        & qty.between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _money(F.sum(_rev4()), 4).alias("revenue"),
        )
        .orderBy("p_brand")
    )


def q208_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost to small-quantity orders —
    lineitems of one brand's small parts whose quantity is below 20% of
    that part's average quantity.

    The correlated ``l_quantity < 0.2 * (SELECT AVG(l_quantity) WHERE
    same part)`` decorrelates into ONE per-part aggregate joined back
    on l_partkey. Unlike q102's langs-sized broadcast, the threshold
    side here scales with |part| — the join-back is CO-PARTITIONED on
    the group key (AQE may still broadcast it at toy SF; at 100 TB it
    is the classic agg-then-shuffle-join). The filtered part dim (one
    brand, sizes 1-5) broadcasts. The threshold compares in exact
    cross-multiplied integers — ``qty * 5 * n > sum_qty`` flipped to
    keep rows strictly below 20% of the average — so no float average
    can flip a boundary row between engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 5)
    )
    qty_l = F.col("l_quantity").cast("bigint")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qty_l).alias("_sum_qty"), F.count(F.lit(1)).alias("_n")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part._pk)
        .filter(qty_l * 5 * F.col("_n") < F.col("_sum_qty"))
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _money(F.sum(_c2("l_extendedprice")), 2).alias("lost_revenue"),
        )
        .orderBy("p_size")
    )


def q209_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order ("kept orders waiting"). Late =
    shipped more than 90 days after the order date (this schema has no
    commit/receipt dates).

    The textbook form is lineitem EXISTS-joined to itself twice
    (another supplier exists; no OTHER late supplier exists) — two
    fact-fact self-joins. Re-expressed for a cluster: collapse to the
    distinct (order, supplier, was_late) grain with ONE exchange, then
    stack the per-order counts (suppliers, late suppliers) as WINDOWS
    over l_orderkey on a second — NOT a groupBy joined back to the
    grain, which would consume the unpersisted grain twice and
    re-execute the whole fact join per consumer (the q83 lineage
    lesson; the join-back form measured 5 scans, this one 3). The
    verdict — supplier is late AND n_late_supp == 1 AND n_supp > 1 —
    is then a filter, and supplier names attach by broadcast on the
    counted (small) frame. Zero self-joins, no count-distinct Expand
    (the distinct grain makes the counts plain), two data-sized
    exchanges. Plan pinned in tests/test_plans.py.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    grain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("_late"))
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        grain.withColumn("_n_supp", F.count(F.lit(1)).over(w))
        .withColumn("_n_late", F.sum("_late").over(w))
        .filter(
            (F.col("_late") == 1)
            & (F.col("_n_supp") > 1)
            & (F.col("_n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waiting.join(
            F.broadcast(supplier), waiting.l_suppkey == supplier.s_suppkey
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def cached_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-persisted weighted bipartite purchase graph for q210:
    one edge per (customer, supplier) pair that ever traded, weight =
    lineitem count, with both endpoints' total out-weights carried on
    the edge (wc, ws). Built once per corpus fingerprint — the three
    PageRank iterations then ride the InMemoryTableScan instead of
    re-executing the fact-fact join per iteration (the q83 lineage
    lesson applied at design time)."""
    from kinesis_logs_reader_spark.functions.caching import corpus_key

    cache = spark.__dict__.setdefault("_klrs_purchase_graph_cache", {})
    ck = (corpus_key(sf_dir, "lineitem"), corpus_key(sf_dir, "orders"))
    if ck not in cache:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        edges = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(
                F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
            )
            .agg(F.count(F.lit(1)).alias("w"))
        )
        # endpoint out-weights as STACKED WINDOWS over the one edge
        # frame — a groupBy-join-back here would consume the
        # unpersisted edges three times inside the cache build and
        # re-execute the fact join per consumer (measured 6 parquet
        # scans; the q83/q209 lineage lesson inside a cache builder)
        cache[ck] = (
            edges.withColumn(
                "wc", F.sum("w").over(Window.partitionBy("c"))
            )
            .withColumn("ws", F.sum("w").over(Window.partitionBy("s")))
            .persist()
        )
    return cache[ck]


def pagerank_supplier_ranks(e: DataFrame) -> DataFrame:
    """The q210 iteration arithmetic over an edge frame
    (c, s, w, wc, ws): 3 damped co-HITS rounds in exact int64
    micro-units, returning (s, _sr). Shared by the batch query and the
    streaming refresh sink (streaming/jobs.py) — one definition, so
    the two surfaces cannot drift apart (the q205 shared-constants
    discipline applied to an iteration kernel)."""
    base = F.lit(150_000).cast("bigint")

    def sup_round(c_ranks: DataFrame | None) -> DataFrame:
        if c_ranks is None:
            contrib = F.expr("(1000000L * w) div wc")
            src = e
        else:
            contrib = F.expr("(_cr * w) div wc")
            src = e.join(c_ranks, "c")
        agg = src.groupBy("s").agg(F.sum(contrib).alias("_m"))
        return agg.select(
            "s", (base + F.expr("(85 * _m) div 100")).alias("_sr")
        )

    def cust_round(s_ranks: DataFrame) -> DataFrame:
        src = e.join(s_ranks, "s")
        agg = src.groupBy("c").agg(
            F.sum(F.expr("(_sr * w) div ws")).alias("_m")
        )
        return agg.select(
            "c", (base + F.expr("(85 * _m) div 100")).alias("_cr")
        )

    s_ranks = sup_round(None)
    for _ in range(2):
        s_ranks = sup_round(cust_round(s_ranks))
    return s_ranks


def q210_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted bipartite PageRank over the customer-supplier purchase
    graph — iterative link analysis (the family beyond q159's
    degree-based dup-graph authority and q75's k-means fixpoint): who
    are the structurally central suppliers when rank mass flows
    through purchase relationships, not just raw order counts?

    Three damped iterations (d = 0.85) of the co-HITS random walk:
    every active customer starts at 1e6 micro-units; suppliers collect
    d * sum over in-edges of (rank * w) div w_out(customer), plus the
    (1-d) base of 150000; customers symmetrically from suppliers. ALL
    arithmetic is int64 with floor division applied per-edge BEFORE
    the sum — written identically in the DuckDB oracle, so ranks are
    bit-identical. (Overflow envelope: rank mass is bounded by
    |active customers| x 1e6; rank * w stays under int64 through
    ~1e14 node-mass x weight — beyond any tested SF; a 100 TB run
    re-normalizes per iteration, same plan shape.)

    Scale shape: the graph (edge + endpoint out-weights) is built once
    and session-persisted (cached_purchase_graph); each iteration is
    one co-partitioned |edges|-sized join against the previous
    |nodes|-sized rank frame plus a map-side-combinable aggregate —
    a linear chain, every intermediate consumed exactly once, no
    lineage re-execution, no collects. Iteration 1 folds the uniform
    init into the expression (no join). Output: top-20 suppliers,
    names attached by broadcast on the counted frame.
    """
    e = cached_purchase_graph(spark, sf_dir)
    s_ranks = pagerank_supplier_ranks(e)
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        s_ranks.join(F.broadcast(supplier), s_ranks.s == supplier.s_suppkey)
        .select("s_name", F.col("_sr").alias("rank_micro"))
        .orderBy(F.col("rank_micro").desc(), "s_name")
        .limit(20)
    )


def q211_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, by
    supplier-nation x customer-nation x ship year — the DUAL-ROLE
    dimension showcase: the same nation table joins twice under
    different aliases (supplier's nation, customer's nation), each
    with its own pushed filter and its own broadcast.

    The two-nation restriction lands on BOTH nation scans (each side
    prunes to 2 of 25 rows before broadcasting); the either-direction
    pair predicate evaluates after the joins on the already-restricted
    frame. Fact side: lineitem filtered to the two ship years joins
    orders on orderkey (co-partitioned), then customer on custkey;
    supplier broadcasts. The final aggregate is <= 2x2x2 groups —
    map-side combinable to nothing.
    """
    n1 = "NATION_1"
    n2 = "NATION_2"
    nation_s = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(n1, n2))
        .select(
            F.col("n_nationkey").alias("_snk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    nation_c = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(n1, n2))
        .select(
            F.col("n_nationkey").alias("_cnk"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
    ) | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    # Prune-first join order (Catalyst has no CBO stats here and keeps
    # syntax order): the nation-restricted supplier broadcast drops
    # ~92% of lineitem BEFORE the fact-fact join, and the customer
    # side arrives already nation-pruned. Measured NEUTRAL at sf~1
    # (1.66 vs 1.75 s — the query is exchange-floor-bound there, ~6
    # stages x ~0.2 s), but the orderkey exchange ships 2/25ths of the
    # lineitem bytes the naive li-orders-first order ships, which is
    # the term that matters at 100 TB. Kept for the scale shape.
    supp_pruned = supplier.join(
        F.broadcast(nation_s), F.col("s_nationkey") == F.col("_snk")
    )
    cust_pruned = cust.join(
        F.broadcast(nation_c), F.col("c_nationkey") == F.col("_cnk")
    )
    # SHUFFLE_HASH on the two shuffled joins (r15 tail audit, guide
    # §3.1 — the q05 rationale applied here): SMJ sorts BOTH shuffled
    # sides of a one-shot equi-join feeding a <=8-group aggregate; the
    # hash build skips the sorts. Interleaved A/B, rows identical:
    # sf0.1 0.345 -> 0.325 s, sf~1 soak 1.046 -> 0.694 s (-34%). The
    # hinted sides' PROJECTED rows per partition (orders: 16 bytes/row;
    # customer: nation-pruned to 2/25ths) fit executor memory at any
    # scale with sane partition counts, and AQE may still override per
    # its own runtime stats.
    return (
        li.join(F.broadcast(supp_pruned), li.l_suppkey == supp_pruned.s_suppkey)
        .join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .join(
            cust_pruned.hint("SHUFFLE_HASH"),
            orders.o_custkey == cust_pruned.c_custkey,
        )
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _money(F.sum(_rev4()), 4).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q212_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer order-count distribution — for
    each order count c, how many customers placed exactly c qualifying
    orders (non-urgent here; the spec excludes a comment pattern this
    schema lacks). The distinctive semantics the suite lacked: a LEFT
    OUTER join that PRESERVES zero-order customers, COUNT(col)'s
    null-skipping (unmatched rows count 0, never 1), and a
    count-of-counts re-aggregation.

    Plan: one co-partitioned left join (customer x filtered orders,
    both scale with SF — no broadcast assumption), a per-customer
    count that partial-aggregates map-side on the join key it already
    shares (no extra exchange), then a <=|distinct counts|-row second
    aggregate. The final frame is tiny at any SF.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
