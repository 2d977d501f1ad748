"""As-of join semantics on a hand-built case: <=-inclusive matching,
no-match nulls, and per-key isolation."""

from __future__ import annotations

from datetime import datetime

from kinesis_logs_reader_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), 100.0),
            (1, datetime(2024, 1, 1, 11, 0), 101.0),
            (2, datetime(2024, 1, 1, 10, 30), 200.0),
        ],
        "sym int, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 30), "t1"),   # -> 10:00 quote
            (1, datetime(2024, 1, 1, 11, 0), "t2"),    # == quote ts -> matches (<=)
            (1, datetime(2024, 1, 1, 9, 0), "t3"),     # before any -> null
            (2, datetime(2024, 1, 1, 12, 0), "t4"),    # key isolation -> 200.0
        ],
        "sym int, tts timestamp, tid string",
    )
    out = {
        r.tid: r.asof_price
        for r in asof_join(
            quotes, trades, key="sym", left_ts="qts", right_ts="tts",
            value_cols=["price"],
        ).collect()
    }
    assert out == {"t1": 100.0, "t2": 101.0, "t3": None, "t4": 200.0}
