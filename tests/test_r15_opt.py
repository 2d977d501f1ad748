"""Round-15 optimization pins: q179's spread keep and q172's revert."""

from __future__ import annotations

import os

SF_DIR = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q179_heavy_branch_spread_dom_branch_not(spark):
    """q179's digest chain (tokenize + md5 of sorted distinct tokens)
    rides the gated round-robin exchange (the r15 A/B keep: -9%); the
    dominant-lang branch reads the raw scan without it. Exactly ONE
    RoundRobinPartitioning in the plan — a second one would mean the
    cheap (source, lang) branch regained the exchange the r14 doctrine
    says is pure latency there. Values are spread-independent (pinned
    against the kill-switch form)."""
    from kinesis_logs_reader_spark.operators.curation import q179_data_card

    df = q179_data_card(spark, SF_DIR)
    plan = _executed_plan(df)
    assert plan.count("RoundRobinPartitioning") == 1, plan[:2000]

    os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
    try:
        df_off = q179_data_card(spark, SF_DIR)
    finally:
        del os.environ["SPARK_GRAFT_NO_SPREAD"]
    assert "RoundRobinPartitioning" not in _executed_plan(df_off)
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, df_off.collect())
    )


def test_q172_stays_unspread(spark):
    """q172's novelty-key chain measured-negative under the exchange
    (+9%, combining groupBy(key) min overlaps the scan) — pin the
    revert so a blanket spread rollout can't silently re-add it."""
    from kinesis_logs_reader_spark.operators.dedup import q172_novelty_curve

    plan = _executed_plan(q172_novelty_curve(spark, SF_DIR))
    assert "RoundRobinPartitioning" not in plan
