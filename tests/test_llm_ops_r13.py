"""Round-13 additions: the deterministic-sketch table profile (q131c).

Layers: estimate accuracy against the exact q131 profile on the real
corpus (the sketch's documented error budget), exactness of the
non-sketch fields, and a pure-Python recomputation of the estimator
from first principles on a constructed column.
"""

from __future__ import annotations

import hashlib
import math

from tests.conftest import SF_DIR


def _rows(df):
    return {r.column_name: r for r in df.collect()}


def test_q131c_estimates_within_error_budget(spark):
    """Every column's deterministic estimate lands within the
    documented budget of the exact distinct count: stderr ~ 1/sqrt(256)
    ~ 6%, up to ~-17% in the f~M crossover band — assert 35% to guard
    gross regressions (a broken rendering or bucket split reads orders
    of magnitude off, not tens of percent)."""
    from kinesis_logs_reader_spark.operators.sqlsurface import (
        q131_table_profile,
        q131c_table_profile_kmv,
    )

    exact = _rows(q131_table_profile(spark, SF_DIR))
    est = _rows(q131c_table_profile_kmv(spark, SF_DIR))
    assert set(exact) == set(est)
    for c in exact:
        n, e = exact[c].n_distinct, est[c].n_distinct_est
        assert abs(e - n) <= max(2, 0.35 * n), (c, n, e)


def test_q131c_non_sketch_fields_match_exact_profile(spark):
    """n_nulls / min_str / max_str are NOT sketched — they must equal
    q131's exactly (same native-type stacked aggregate)."""
    from kinesis_logs_reader_spark.operators.sqlsurface import (
        q131_table_profile,
        q131c_table_profile_kmv,
    )

    exact = _rows(q131_table_profile(spark, SF_DIR))
    est = _rows(q131c_table_profile_kmv(spark, SF_DIR))
    for c in exact:
        assert (est[c].n_nulls, est[c].min_str, est[c].max_str) == (
            exact[c].n_nulls,
            exact[c].min_str,
            exact[c].max_str,
        )


def test_q131c_estimator_recomputed_in_python(spark, tmp_path):
    """First-principles check of the sketch arithmetic: build a column
    of KNOWN distinct values, replay md5 -> substream/grid split ->
    per-bucket min -> hybrid estimator in pure Python, and assert the
    query's estimate equals the replay exactly (determinism is the
    whole contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.sqlsurface import (
        q131c_table_profile_kmv,
    )

    n = 500
    keys = list(range(1, n + 1))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": keys,
                "o_custkey": [k % 7 for k in keys],
                "o_orderstatus": ["O"] * n,
                "o_totalprice": [100.25] * n,
                "o_orderdate": [1_700_000_000_000_000] * n,
            },
            schema=pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderstatus", pa.string()),
                    ("o_totalprice", pa.float64()),
                    ("o_orderdate", pa.timestamp("us")),
                ]
            ),
        ),
        tmp_path / "orders.parquet",
    )
    # add the missing column via an overwrite with priority included
    import pandas as pd

    pdf = pd.read_parquet(tmp_path / "orders.parquet")
    pdf["o_orderpriority"] = "1-URGENT"
    pdf.to_parquet(tmp_path / "orders.parquet", index=False)

    M, S = 256, 1 << 44
    mins: dict[int, int] = {}
    for k in set(keys):
        w = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
        b, u = w % M, w // M
        mins[b] = min(mins.get(b, S), u)
    f = len(mins)
    if f < M:
        expected = math.floor(-M * math.log((M - f) / M) + 0.5)
    else:
        expected = (S * M * M) // (sum(mins.values())) - M
    got = _rows(q131c_table_profile_kmv(spark, str(tmp_path)))
    assert got["o_orderkey"].n_distinct_est == expected
    # the constant columns have exactly 1 distinct value -> LC gives 1
    for c in ("o_orderstatus", "o_totalprice", "o_orderdate"):
        assert got[c].n_distinct_est == 1, c
