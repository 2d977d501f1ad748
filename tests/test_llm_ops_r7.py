"""Semantic tests for the round-5 operators (q110b, q158, q159) —
invariants the SQL oracle's value hash cannot express: top-K RRF
agreement with the full-rank twin on the fused head, fuzzy-variant
resolution picking the dominant spelling, and the integer-PageRank
authority ordering separating dup-cluster hubs from leaves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import curation, dedup, textstats

from tests.conftest import SF_DIR


def test_q110b_topk_matches_full_rank_head(spark):
    """Every doc the top-K fusion surfaces that sits in BOTH retriever
    top-60 lists must carry the same ranks and rrf as q110's exact
    full-corpus form (ranks <= K coincide with global ranks)."""
    full = {
        r.doc_id: (r.rank_cos, r.rank_bm25, r.rrf)
        for r in curation.q110_rrf_hybrid(spark, SF_DIR).collect()
    }
    topk = curation.q110b_rrf_topk(spark, SF_DIR).collect()
    assert len(topk) == 20
    both = [r for r in topk if r.rank_cos is not None and r.rank_bm25 is not None]
    for r in both:
        if r.doc_id in full:
            assert full[r.doc_id] == (r.rank_cos, r.rank_bm25, r.rrf)


def test_q158_preferred_is_dominant_spelling(spark):
    rows = textstats.q158_fuzzy_variants(spark, SF_DIR).collect()
    assert rows, "part-name vocabulary must contain edit-distance pairs"
    for r in rows:
        assert 1 <= r.dist <= 2
        assert r.tok_a < r.tok_b
        want = r.tok_a if r.df_a >= r.df_b else r.tok_b
        assert r.preferred == want


def test_q159_authority_favors_hubs(spark):
    """pr2 is bounded below by the damping floor, and a node's rank is
    monotone in its neighborhood: within the top-20, the max-degree
    node must score at least the min-degree node's pr2."""
    rows = dedup.q159_dup_authority(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.pr2_ppm >= 150000 and r.degree >= 1
    hi = max(rows, key=lambda r: r.degree)
    lo = min(rows, key=lambda r: r.degree)
    assert hi.pr2_ppm >= lo.pr2_ppm or hi.degree == lo.degree
