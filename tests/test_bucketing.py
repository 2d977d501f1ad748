"""Bucketed co-located joins: the zero-shuffle join path for repeated
big-big joins at scale.

Writing both sides bucketed on the join key (``bucketBy`` + sorted)
lets Spark join them with NO exchange on either side — at 100 TB that
removes the dominant cost of every orders⋈lineitem query. The plan
assertion here is the point: bucket pruning of the shuffle must
actually happen, not just be intended.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.plans import explain
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    """Write orders + lineitem bucketed by the join key (8 buckets)."""
    suffix = uuid.uuid4().hex[:8]
    names = (f"orders_b_{suffix}", f"lineitem_b_{suffix}")
    (
        load_table(spark, SF_DIR, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(names[0])
    )
    (
        load_table(spark, SF_DIR, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(names[1])
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = (
        spark.table(lineitem_b)
        .join(spark.table(orders_b), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = explain.formatted_plan(joined)
    # the join itself must not shuffle either side: the only exchange
    # allowed is the one for the final tiny aggregation (formatted mode
    # splits node name and arguments across lines, so match on the
    # hashpartitioning argument itself, not "Exchange hashpartitioning")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    got = (
        spark.table(lineitem_b)
        .join(spark.table(orders_b), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    want = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want > 0


def test_digest_bucketed_index_probe_join_no_index_shuffle(spark):
    """The q160/admission-sink docstring claim as a plan assertion: a
    corpus signature index written bucketed by digest is probed by an
    incoming batch with NO exchange on the index side (the batch is
    either broadcast or bucketed the same way — nothing corpus-index-
    sized shuffles per admission)."""
    import uuid

    from kinesis_logs_reader_spark.operators.dedup import (
        get_or_build_corpus_index,
    )

    suffix = uuid.uuid4().hex[:8]
    idx_name = f"corpus_idx_b_{suffix}"
    inc_name = f"incoming_b_{suffix}"
    try:
        (
            get_or_build_corpus_index(spark, SF_DIR)
            .write.bucketBy(8, "digest")
            .sortBy("digest")
            .mode("overwrite")
            .saveAsTable(idx_name)
        )
        (
            load_table(spark, SF_DIR, "documents")
            .filter(F.col("doc_id") % 10 == 7)
            .select("doc_id", F.md5("text").alias("digest"))
            .write.bucketBy(8, "digest")
            .sortBy("digest")
            .mode("overwrite")
            .saveAsTable(inc_name)
        )
        # force the at-scale path: a 100 TB index never broadcasts, so
        # pin the sort-merge plan with NO hash shuffle on either side
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = spark.table(inc_name).join(
                spark.table(idx_name)
                .filter(F.col("band_idx") == -1)
                .select("digest"),
                "digest",
                "left_semi",
            )
            plan = explain.formatted_plan(probe)
            assert "SortMergeJoin" in plan, plan
            # both sides bucketed on digest: ZERO shuffles anywhere
            assert "hashpartitioning(digest" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx_name}")
        spark.sql(f"DROP TABLE IF EXISTS {inc_name}")
