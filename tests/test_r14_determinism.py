"""Round-14 determinism pins (VERDICT r13 item 2 + the r14 spread_scan
optimization).

1. The persisted k-means index must be BIT-DETERMINISTIC under a fresh
   retrain at different partition counts: q215/q75/q109/q141/q185-q190
   all route against centroids that a fresh driver sandbox re-derives,
   so any partitioning- or warehouse-state-dependence would surface as
   a driver hash-red that no local mirror reproduces.
2. spread_scan must be value-neutral and gate correctly (no-op on a
   many-split or synthetic frame; repartition only when the scan
   starves the configured parallelism).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np

from tests.conftest import SF_DIR


def _fresh_centroids(spark, sf_dir, n_parts: int):
    """Retrain from NOTHING (no disk index, no process cache) at the
    given shuffle-partition count, returning the raw centroid matrix."""
    from kinesis_logs_reader_spark.operators import similarity as sim
    from kinesis_logs_reader_spark.sources.tables import load_table

    # wipe both cache layers: the module-level matrix cache and every
    # on-disk index the repo root holds for this corpus
    sim._KMEANS_CACHE.clear()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(
        os.path.join(repo_root, "spark-warehouse", "kmeans_index", "*.parquet")
    ):
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            os.unlink(p)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = sim.kmeans_centroids(emb, n_clusters=16, n_iter=3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return np.asarray(cents, dtype=np.int64)


def test_kmeans_retrain_bit_identical_across_partitionings(spark):
    """Fresh-warehouse retrain at 2 and 8 shuffle partitions (and with
    the input repartitioned wide) yields byte-identical centroids —
    the driver-env reproduction contract for q215's persisted index."""
    a = _fresh_centroids(spark, SF_DIR, 2)
    b = _fresh_centroids(spark, SF_DIR, 8)
    assert a.shape == b.shape == (16, 64)
    assert (a == b).all(), "k-means centroids depend on partitioning"

    # and under an explicit wide repartition of the training input
    from kinesis_logs_reader_spark.operators import similarity as sim
    from kinesis_logs_reader_spark.sources.tables import load_table

    sim._KMEANS_CACHE.clear()
    emb = load_table(spark, SF_DIR, "embeddings").repartition(16)
    c = np.asarray(
        sim.kmeans_centroids(emb, n_clusters=16, n_iter=3), dtype=np.int64
    )
    assert (a == c).all(), "k-means centroids depend on input layout"


def test_spread_scan_gates_and_preserves_values(spark):
    """spread_scan: (1) values unchanged, (2) partition count raised on
    a single-file scan, (3) exact no-op on a non-file-backed frame."""
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.sources.tables import load_table, spread_scan

    docs = load_table(spark, SF_DIR, "documents")
    spread = spread_scan(docs)
    cores = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == max(2, cores // 2)
    base = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r.text for r in spread.collect()}
    assert base == got

    synthetic = spark.range(10).select(F.col("id").alias("doc_id"))
    assert spread_scan(synthetic) is synthetic


def test_cc_propagation_branch_stays_distributed(spark):
    """The >threshold regime of connected_components (q74's 100-TB
    path) must run as min-label propagation with NO driver collect:
    its result plan reads the cached distributed edge frame, never a
    LocalTableScan / Scan ExistingRDD that a collect-and-recreate
    round-trip would leave behind. The union-find regime, by contrast,
    IS driver-side — assert the plans differ exactly that way."""
    from kinesis_logs_reader_spark.operators.dedup import (
        _cached_minhash_pairs,
        connected_components,
    )

    pairs = _cached_minhash_pairs(spark, SF_DIR)
    dist = connected_components(pairs, driver_threshold=0)
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "ExistingRDD" not in plan, (
        "propagation branch must not round-trip through the driver"
    )

    small = connected_components(pairs)  # under threshold -> union-find
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in small_plan or "ExistingRDD" in small_plan

    # both regimes agree on the real pair graph
    assert {(r.node, r.cluster_id) for r in dist.collect()} == {
        (r.node, r.cluster_id) for r in small.collect()
    }
