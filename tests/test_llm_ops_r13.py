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


def _write_events(path, rows):
    """rows: (event_id, ts_us_epoch, user_id)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            },
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        ),
        path + "/events.parquet",
    )


def _advisor_replay(points, m=64, bits=5):
    """Pure-Python replay of the q204 simulation: points = [(x, y)]."""
    xm, ym = max(p[0] for p in points), max(p[1] for p in points)
    box = (xm // 8, xm // 4, ym // 8, ym // 4)

    def morton(xs, ys):
        z = 0
        for i in range(bits):
            z |= ((xs >> i) & 1) << (2 * i)
            z |= ((ys >> i) & 1) << (2 * i + 1)
        return z

    files = {}
    for x, y in points:
        xs, ys = x * (1 << bits) // (xm + 1), y * (1 << bits) // (ym + 1)
        for layout, f in (
            ("sort_x", xs * m // (1 << bits)),
            ("sort_y", ys * m // (1 << bits)),
            ("zorder", morton(xs, ys) * m // (1 << (2 * bits))),
        ):
            st = files.setdefault((layout, f), [0, 10**9, -1, 10**9, -1])
            st[0] += 1
            st[1], st[2] = min(st[1], x), max(st[2], x)
            st[3], st[4] = min(st[3], y), max(st[4], y)
    x_lo, x_hi, y_lo, y_hi = box
    matching = sum(
        1 for x, y in points if x_lo <= x <= x_hi and y_lo <= y <= y_hi
    )
    out = {}
    for layout in ("sort_x", "sort_y", "zorder"):
        fl = {k: v for k, v in files.items() if k[0] == layout}
        hit = [
            v
            for v in fl.values()
            if v[1] <= x_hi and v[2] >= x_lo and v[3] <= y_hi and v[4] >= y_lo
        ]
        out[layout] = {
            "n_files": len(fl),
            "n_files_hit": len(hit),
            "rows_scanned": sum(v[0] for v in hit),
            "rows_matching": matching,
        }
    return out


def test_q204_full_python_replay_on_planted_grid(spark, tmp_path):
    """A complete 32x32 (user, hour) grid: the advisor's every integer
    must equal the pure-Python replay of the simulation, and Z-order
    must be the recommendation (a user-sorted layout reads ~1/4 of
    files for the quarter-range box, the curve reads only the corner
    tiles)."""
    from kinesis_logs_reader_spark.operators.preprocess import (
        q204_zorder_layout_advisor,
    )

    base_us = 1_700_000_000 * 1_000_000
    rows, eid = [], 0
    points = [(x, y) for x in range(32) for y in range(32)]
    for x, y in points:
        rows.append((eid, base_us + y * 3600 * 1_000_000, x))
        eid += 1
    _write_events(str(tmp_path), rows)
    got = {
        r.layout: r
        for r in q204_zorder_layout_advisor(spark, str(tmp_path)).collect()
    }
    want = _advisor_replay(points)
    for layout, w in want.items():
        g = got[layout]
        assert (
            g.n_files,
            g.n_files_hit,
            g.rows_scanned,
            g.rows_matching,
        ) == (
            w["n_files"],
            w["n_files_hit"],
            w["rows_scanned"],
            w["rows_matching"],
        ), layout
    assert got["zorder"].recommended
    assert not got["sort_x"].recommended and not got["sort_y"].recommended
    # scanning a superset of the matching rows is a simulation invariant
    for r in got.values():
        assert r.rows_scanned >= r.rows_matching


def test_q204_plan_shape(spark):
    """q204's plan: ONE corpus-scale exchange (the <=3x64-group
    (layout, file) aggregate, partial-combined map-side), scalar
    maxima/box/selectivity ride broadcast one-row joins (the
    sanctioned idiom — BNLJ allowed, never a CartesianProduct or
    SMJ), exactly one Generate (the 3-layout explode), no Python."""
    import re

    from kinesis_logs_reader_spark.operators.preprocess import (
        q204_zorder_layout_advisor,
    )
    from tests.conftest import SF_DIR
    from tests.test_plans import explain

    plan = explain.formatted_plan(q204_zorder_layout_advisor(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    nodes = set(re.findall(r"\(\d+\) Generate", plan))
    assert len(nodes) == 1, plan
    assert "partial_min" in plan or "partial_count" in plan


def test_q205_verdict_classes_by_construction(spark):
    """The planted scenario hits every verdict class on the real
    corpus: same-length mutation sources trigger churn with EXACTLY
    zero drift, vanished sources saturate both signals, the padded-
    addition sources sit below the churn bar (166,666 < 200,000) but
    above the drift bar, and untouched sources read exact zeros."""
    from kinesis_logs_reader_spark.operators.dedup import q205_retrain_trigger

    rows = {r.source: r for r in q205_retrain_trigger(spark, SF_DIR).collect()}
    assert len(rows) == 20
    for s in ("src3", "src13"):
        assert (rows[s].trigger, rows[s].churn_ppm, rows[s].drift_ppm) == (
            "churn",
            1_000_000,
            0,
        ), s
    for s in ("src9", "src19"):
        assert (rows[s].trigger, rows[s].churn_ppm, rows[s].drift_ppm) == (
            "both",
            1_000_000,
            1_000_000,
        ), s
    for s in ("src7", "src17"):
        r = rows[s]
        assert r.trigger == "drift" and r.retrain, s
        assert r.churn_ppm == 166_666  # 1/6 of the key union, floor-div
        assert r.drift_ppm >= 150_000
    for s in ("src0", "src2", "src4"):
        assert (rows[s].trigger, rows[s].retrain, rows[s].churn_ppm,
                rows[s].drift_ppm) == ("none", False, 0, 0), s


def test_q205_plan_shape(spark):
    """q205: the churn side's key-keyed full-outer digest join is the
    only corpus-scale exchange family (full outer cannot broadcast —
    SMJ is expected there, the q199 lesson); the drift side partial-
    aggregates into <= |sources| x 16 cells; no Python, no cartesian;
    text moves as 16-byte md5 digests through the join, never raw."""
    from kinesis_logs_reader_spark.operators.dedup import q205_retrain_trigger
    from tests.test_plans import explain

    plan = explain.formatted_plan(q205_retrain_trigger(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_q131c_minsum_branch_recomputed_in_python(spark, tmp_path):
    """The f=M estimator branch (every substream hit — the branch the
    500-key LC test never reaches): 20k distinct keys saturate all 256
    substreams whp; the query's estimate must equal the pure-Python
    integer min-sum replay exactly, and the replay must confirm f=M
    actually held (else the fixture, not the engine, is wrong)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.sqlsurface import (
        q131c_table_profile_kmv,
    )

    n = 20_000
    keys = list(range(1, n + 1))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": keys,
                "o_custkey": [k % 7 for k in keys],
                "o_orderstatus": ["O"] * n,
                "o_totalprice": [100.25] * n,
                "o_orderdate": [1_700_000_000_000_000] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            },
            schema=pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderstatus", pa.string()),
                    ("o_totalprice", pa.float64()),
                    ("o_orderdate", pa.timestamp("us")),
                    ("o_orderpriority", pa.string()),
                ]
            ),
        ),
        tmp_path / "orders.parquet",
    )
    M, S = 256, 1 << 44
    mins: dict[int, int] = {}
    for k in keys:
        w = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
        mins[w % M] = min(mins.get(w % M, S), w // M)
    assert len(mins) == M, "fixture must saturate every substream"
    expected = (S * M * M) // sum(mins.values()) - M
    got = _rows(q131c_table_profile_kmv(spark, str(tmp_path)))
    assert got["o_orderkey"].n_distinct_est == expected
    # and the estimate is within the documented budget of the truth
    assert abs(expected - n) <= 0.25 * n


def test_q213_line_boilerplate_survives_adversarial_corpus(spark, tmp_path):
    """Totality floor for the late-r13 line-boilerplate kernel: q213
    must RUN with its invariants intact on empty docs, whitespace-only
    docs, multi-byte unicode/emoji, NUL bytes, and a 100 KB monster —
    the regexp chunker and the banner-planting array concat both touch
    every byte. (The oracle legitimately assumes the generator corpus;
    this pins the Spark side's totality, the r11 multimodal
    discipline.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.curation import (
        q213_line_boilerplate,
    )

    texts = [
        "",
        " ",
        "a",
        "é ü ß 中文 🦆" * 3,
        "x\x00y " * 40,
        "z" * 100_000,
        "normal prose with several tokens in it " * 4,
        "  \t\n  ",
        None,
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["fuzz"] * len(texts),
                "lang": ["xx"] * len(texts),
                "n_chars": [len(t) if t else 0 for t in texts],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("source", pa.string()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        tmp_path / "documents.parquet",
    )
    rows = q213_line_boilerplate(spark, str(tmp_path)).collect()
    assert len(rows) == 1  # one source
    r = rows[0]
    assert r.n_lines >= 3  # banners planted on doc_id 0,3,6 (%3) + 0,5 (%5)
    assert 0 <= r.n_removed <= r.n_lines
    assert 0 <= r.retention_ppm <= 1_000_000
    # 9 docs < 30-doc threshold: nothing (incl. the banners) may flag
    assert r.n_removed == 0 and r.retention_ppm == 1_000_000


def test_q213_flags_exactly_the_cross_doc_repeats(spark, tmp_path):
    """Constructed-corpus semantics: with 90 docs, every third doc
    (30 of them) carries the newsletter banner — exactly at the
    >= 30-doc threshold, so the banner line must flag while every
    organic line (unique per doc) and the cookie banner (18 docs,
    under threshold) must survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.curation import (
        q213_line_boilerplate,
    )

    n = 90
    texts = [f"unique organic line number {i} for this document only" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": texts,
                "source": ["s"] * n,
                "lang": ["xx"] * n,
                "n_chars": [len(t) for t in texts],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("source", pa.string()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        tmp_path / "documents.parquet",
    )
    rows = q213_line_boilerplate(spark, str(tmp_path)).collect()
    r = rows[0]
    # lines: 90 organic (one 10-token chunk each... the 9-word organic
    # text is ONE chunk) + 30 newsletter + 18 cookie = 138; removed:
    # exactly the 30 newsletter instances (cookie = 18 < 30 survives)
    assert r.n_lines == 138
    assert r.n_removed == 30
    assert r.retention_ppm == ((138 - 30) * 1_000_000) // 138


def test_pagerank_star_graph_semantics(spark):
    """Constructed-graph sanity for the shared PageRank kernel: a hub
    supplier traded by every customer must out-rank a leaf supplier
    with one customer, and splitting a customer's weight toward the
    hub must raise the hub's rank — the 'PageRank-ness' the oracle's
    arithmetic equality alone doesn't assert."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesis_logs_reader_spark.operators.analytics import (
        pagerank_supplier_ranks,
    )

    def ranks(pairs):
        edges = (
            spark.createDataFrame(pairs, "c long, s long")
            .groupBy("c", "s")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        e = edges.withColumn(
            "wc", F.sum("w").over(Window.partitionBy("c"))
        ).withColumn("ws", F.sum("w").over(Window.partitionBy("s")))
        return {r.s: r._sr for r in pagerank_supplier_ranks(e).collect()}

    # hub supplier 100 serves customers 1-6; leaf supplier 200 serves
    # only customer 1 (which splits its weight hub/leaf)
    star = [(c, 100) for c in range(1, 7)] + [(1, 200)]
    r = ranks(star)
    assert r[100] > r[200]
    # doubling customer 1's hub edge weight shifts its split toward the
    # hub: hub rank rises, leaf rank falls
    star2 = star + [(1, 100)]
    r2 = ranks(star2)
    assert r2[100] > r[100]
    assert r2[200] < r[200]


def test_q215_selection_invariants_on_real_corpus(spark):
    """q215's selection must be internally consistent on the real
    corpus: per cluster at most 8 rows, ranks contiguous from 1,
    monotone non-decreasing d2 along the rank, and n_members >= the
    number selected; total selected == sum over clusters."""
    from collections import defaultdict

    from kinesis_logs_reader_spark.operators.similarity import (
        q215_cluster_balanced_sample,
    )

    from tests.conftest import SF_DIR

    rows = q215_cluster_balanced_sample(spark, SF_DIR).collect()
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster].append(r)
    for cl, rs in by_cluster.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 8
        d2s = [r.d2 for r in rs]
        assert d2s == sorted(d2s)
        assert all(r.n_members >= len(rs) for r in rs)


def test_q216_triangle_count_on_constructed_graph(spark, tmp_path):
    """Constructed-corpus triangle arithmetic: three mutually
    near-identical docs (a 3-clique in the candidate graph) plus one
    doc pairing with only one of them (a pendant) -> exactly one
    triangle, each clique member in 1, the pendant in 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.dedup import (
        q216_triangle_census,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    texts = [
        base + "one",
        base + "two",
        base + "three",
        # pendant: shares a long prefix with doc 0 only via a distinct
        # tail that still collides on the leading shingles
        base[: len(base) // 2] + "entirely different back half of words here",
        "unrelated document with its own private vocabulary entirely",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["s"] * len(texts),
                "lang": ["xx"] * len(texts),
                "n_chars": [len(t) for t in texts],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("source", pa.string()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        tmp_path / "documents.parquet",
    )
    got = {r.doc_id: r.n_triangles for r in q216_triangle_census(spark, str(tmp_path)).collect()}
    # docs 0,1,2 form the clique; 3 pairs with 0/1/2 via the shared
    # half-prefix (it may or may not clear the pair threshold — accept
    # either), 4 is isolated. The 3-clique triangle must exist.
    assert got.get(0, 0) >= 1 and got.get(1, 0) >= 1 and got.get(2, 0) >= 1
    assert 4 not in got
