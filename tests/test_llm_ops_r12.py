"""Round-12 additions: cross-modal RRF retrieval (q199).

Layered like the prior rounds' suites: planted-ranking semantics on a
constructed corpus, and the integer RRF contract recomputed in pure
Python from the emitted ranks.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["t"] * len(texts),
                "lang": ["en"] * len(texts),
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
    return str(tmp_path)


def test_q199_planted_ranking_semantics(spark, tmp_path):
    """A byte-identical copy of the query doc must lead BOTH lists
    (hamming 0 -> rank_vis 1; full token overlap + doc_id tie-break ->
    rank_lex 1) and therefore the fused list; a token-disjoint doc has
    no lexical rank at all (it never joins the query's token set)."""
    from kinesis_logs_reader_spark.operators.multimodal import (
        q199_crossmodal_rrf,
    )

    q = "alpha beta gamma delta " * 8
    sf = _write_docs(
        tmp_path,
        [
            q,  # doc 0: the query item
            q,  # doc 1: identical twin — wins both modalities
            "delta gamma beta alpha " * 8,  # doc 2: same tokens, other pixels
            "zeta eta theta iota " * 8,  # doc 3: token-disjoint
        ],
    )
    rows = {r.doc_id: r for r in q199_crossmodal_rrf(spark, sf).collect()}
    assert rows[1].rank_vis == 1 and rows[1].rank_lex == 1
    assert rows[1].rrf_ppm == max(r.rrf_ppm for r in rows.values())
    assert rows[2].rank_lex == 2  # equal overlap, doc_id tie-break
    assert rows[3].rank_lex is None
    assert rows[3].rank_vis is not None  # every doc has a visual rank


def test_q199_integer_rrf_contract(spark):
    """On the real corpus: <=20 rows, ranks in [1, 60], and rrf_ppm is
    EXACTLY the integer micro-unit recomputation from the emitted ranks
    (1000000 // (60 + rank), absent list contributes 0) — the q110b
    idiom that keeps the hashed column float-free."""
    from kinesis_logs_reader_spark.operators.multimodal import (
        q199_crossmodal_rrf,
    )

    rows = q199_crossmodal_rrf(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.rank_vis is not None or r.rank_lex is not None
        want = 0
        if r.rank_vis is not None:
            assert 1 <= r.rank_vis <= 60
            want += 1_000_000 // (60 + r.rank_vis)
        if r.rank_lex is not None:
            assert 1 <= r.rank_lex <= 60
            want += 1_000_000 // (60 + r.rank_lex)
        assert r.rrf_ppm == want


def test_q201_advice_ladder_all_classes(spark):
    """On the real corpus every rung of the advice ladder fires:
    o_orderstatus (3 keys, one >10%) -> salt; c_nationkey (25 keys,
    none dominant) -> broadcast_or_preagg; l_orderkey (high-card,
    uniform) -> hash_ok. And the numbers recompute: max_share_ppm and
    rows_per_key are exact integer div of the emitted counts."""
    from kinesis_logs_reader_spark.operators.skew import q201_skew_advisor

    rows = {
        (r.table_name, r.key_name): r
        for r in q201_skew_advisor(spark, SF_DIR).collect()
    }
    assert rows[("orders", "o_orderstatus")].advice == "salt"
    assert rows[("customer", "c_nationkey")].advice == "broadcast_or_preagg"
    assert rows[("lineitem", "l_orderkey")].advice == "hash_ok"
    for r in rows.values():
        assert r.max_share_ppm == r.max_key_rows * 1_000_000 // r.n_rows
        assert r.rows_per_key == r.n_rows // r.n_keys
        assert r.n_keys <= r.n_rows and r.max_key_rows <= r.n_rows


def test_q201_thresholds_are_the_skew_module_constants(spark):
    """The advice ladder must use skew.py's own constants (the advisor
    exists to surface that module's mitigation ladder): recompute the
    advice from the emitted profile columns with SALT_SHARE_PPM /
    LOW_PARALLELISM_KEYS and require an exact match."""
    from kinesis_logs_reader_spark.operators.skew import (
        LOW_PARALLELISM_KEYS,
        SALT_SHARE_PPM,
        q201_skew_advisor,
    )

    for r in q201_skew_advisor(spark, SF_DIR).collect():
        if r.max_share_ppm >= SALT_SHARE_PPM:
            want = "salt"
        elif r.n_keys < LOW_PARALLELISM_KEYS:
            want = "broadcast_or_preagg"
        else:
            want = "hash_ok"
        assert r.advice == want, (r.table_name, r.key_name)


def test_q202_confusion_identities_and_monotonicity(spark):
    """ROC bookkeeping on the real corpus: tp/fp non-decreasing in the
    threshold, tp+fn and fp+tn constant (the class totals), the final
    row classifies everything positive (fn = tn = 0, recall = 1e6),
    and every ppm column is the exact integer div of its parts."""
    from kinesis_logs_reader_spark.operators.similarity import (
        q202_retrieval_calibration,
    )

    rows = q202_retrieval_calibration(spark, SF_DIR).collect()
    assert len(rows) >= 2
    p_tot = rows[0].tp + rows[0].fn
    n_tot = rows[0].fp + rows[0].tn
    prev_tp = prev_fp = -1
    for r in rows:
        assert r.tp + r.fn == p_tot and r.fp + r.tn == n_tot
        assert r.tp >= prev_tp and r.fp >= prev_fp
        prev_tp, prev_fp = r.tp, r.fp
        assert r.precision_ppm == r.tp * 1_000_000 // (r.tp + r.fp)
        assert r.recall_ppm == r.tp * 1_000_000 // p_tot
    last = rows[-1]
    assert last.fn == 0 and last.tn == 0 and last.recall_ppm == 1_000_000


def test_q202_perfect_separation_constructed(spark, tmp_path):
    """Planted geometry: label-0 vectors at the origin, label-1 far
    away -> some threshold achieves precision = recall = 1e6 (the
    sweep must find the clean operating point when one exists)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.similarity import (
        q202_retrieval_calibration,
    )

    vecs, labels = [], []
    for i in range(8):
        vecs.append([0.001 * i] * 64)
        labels.append(0)
    for i in range(8):
        vecs.append([50.0 + i] * 64)
        labels.append(1)
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(16)),
                "label": labels,
                "embedding": vecs,
            },
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("label", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                ]
            ),
        ),
        tmp_path / "embeddings.parquet",
    )
    rows = q202_retrieval_calibration(spark, str(tmp_path)).collect()
    assert any(
        r.precision_ppm == 1_000_000 and r.recall_ppm == 1_000_000
        for r in rows
    )


def test_q203_constructed_delta_ledger(spark, tmp_path):
    """Explicit snapshots: key k = doc_id // 2, even = v0, odd = v1.
    Construct one key per class and check the per-source ledger and
    churn exactly."""
    from kinesis_logs_reader_spark.operators.dedup import q203_snapshot_delta

    docs = [
        # key 0: unchanged (same text both versions), source a
        (0, "same text", "a"),
        (1, "same text", "a"),
        # key 1: changed, source a
        (2, "old text", "a"),
        (3, "new text", "a"),
        # key 2: removed (v0 only), source b
        (4, "going away", "b"),
        # key 3: added (v1 only), source b
        (7, "brand new", "b"),
    ]
    _write_docs_with_sources(tmp_path, docs)
    rows = {r.source: r for r in q203_snapshot_delta(spark, str(tmp_path)).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_added, a.n_removed, a.n_changed, a.n_unchanged) == (0, 0, 1, 1)
    assert a.churn_ppm == 1_000_000 // 2
    assert (b.n_added, b.n_removed, b.n_changed, b.n_unchanged) == (1, 1, 0, 0)
    assert b.churn_ppm == 1_000_000


def _write_docs_with_sources(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "source": [d[2] for d in docs],
                "lang": ["en"] * len(docs),
                "n_chars": [len(d[1]) for d in docs],
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


def test_q203_key_conservation(spark):
    """On the real corpus: the four classes partition the key union —
    sum over sources equals |v0 keys| + |added keys|, and removed +
    changed + unchanged equals |v0 keys|."""
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.operators.dedup import q203_snapshot_delta
    from kinesis_logs_reader_spark.sources.tables import load_table

    rows = q203_snapshot_delta(spark, SF_DIR).collect()
    tot = {
        c: sum(r[c] for r in rows)
        for c in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    docs = load_table(spark, SF_DIR, "documents")
    n_v0 = docs.filter(F.col("doc_id") % 2 == 0).count()
    n_v1 = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_v0
    assert tot["n_added"] + tot["n_changed"] + tot["n_unchanged"] == n_v1
