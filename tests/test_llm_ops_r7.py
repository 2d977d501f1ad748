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
        r.doc_id: (r.rank_cos, r.rank_bm25)
        for r in curation.q110_rrf_hybrid(spark, SF_DIR).collect()
    }
    topk = curation.q110b_rrf_topk(spark, SF_DIR).collect()
    assert len(topk) == 20
    both = [r for r in topk if r.rank_cos is not None and r.rank_bm25 is not None]
    for r in both:
        if r.doc_id in full:
            assert full[r.doc_id] == (r.rank_cos, r.rank_bm25)
        # rrf_ppm is pure integer arithmetic on the two ranks
        want_ppm = 1000000 // (60 + r.rank_cos) + 1000000 // (60 + r.rank_bm25)
        assert r.rrf_ppm == want_ppm


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


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_q152b_twin_equals_exact_ntile(spark):
    """The range-partitioned production path (q152b) must reproduce the
    global-NTILE oracle twin (q152) row-for-row — same deciles, same
    stats — at test scale."""
    exact = _rows_set(textstats.q152_perplexity_buckets(spark, SF_DIR))
    scalable = _rows_set(
        textstats.q152b_perplexity_buckets_scalable(spark, SF_DIR)
    )
    assert exact == scalable and len(exact) == 10


def test_q158b_twin_equals_all_pairs(spark):
    """Deletion-neighborhood banding (q158b) is candidate-complete for
    dist <= 2: its output must equal q158's exact all-pairs form."""
    exact = _rows_set(textstats.q158_fuzzy_variants(spark, SF_DIR))
    banded = _rows_set(textstats.q158b_fuzzy_variants_banded(spark, SF_DIR))
    assert exact == banded and len(exact) > 0


def test_q158b_banding_prunes_candidates(spark):
    """The banded candidate count must be well under the |V|^2/2 theta
    comparisons the exact form performs — the point of the banding."""
    from kinesis_logs_reader_spark.operators.textstats import (
        _deletion_neighborhood,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table

    part = load_table(spark, SF_DIR, "part")
    vocab = (
        part.select(
            F.explode(F.array_distinct(F.split("p_name", " "))).alias("t")
        )
        .filter(F.length("t") > 0)
        .groupBy("t")
        .count()
    )
    v = vocab.count()
    bands = vocab.select(
        "t", F.explode(_deletion_neighborhood("t")).alias("band")
    )
    n_cand = (
        bands.alias("a")
        .join(bands.alias("b"), "band")
        .filter(F.col("a.t") < F.col("b.t"))
        .select("a.t", "b.t")
        .distinct()
        .count()
    )
    assert n_cand < (v * (v - 1)) // 2 / 2, (n_cand, v)


def test_deletion_neighborhood_sql_matches_reference(spark):
    """The Catalyst HOF expression in textstats._deletion_neighborhood
    computes exactly the <=2-deletion set (one job over 60 random-ish
    tokens; reference mirrored from tests.test_properties)."""
    from tests.test_properties import _ref_del_neighborhood

    toks = [
        f"{a}{b}{c}"[: 1 + (i % 6)]
        for i, (a, b, c) in enumerate(
            (x, y, z)
            for x in ("ab", "ba", "aa")
            for y in ("c", "cc", "")
            for z in ("de", "ed", "d", "")
        )
    ]
    toks = sorted(set(t for t in toks if t))[:60]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    rows = df.select(
        "t", textstats._deletion_neighborhood("t").alias("nb")
    ).collect()
    for r in rows:
        assert set(r["nb"]) == _ref_del_neighborhood(r["t"]), r["t"]


def test_q160_verdict_semantics(spark):
    """Planted admissions land in the right verdict class: corpus
    replays (+4_000_000_000_000) are exact_corpus, batch replays
    (+8_000_000_000_000) are exact_batch, and counts/checksums
    reconcile with the plants."""
    from kinesis_logs_reader_spark.operators.dedup import (
        q160_incremental_dedup,
    )

    rows = {
        r["verdict"]: (r["n_docs"], r["id_checksum"])
        for r in q160_incremental_dedup(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_corpus_replays = docs.filter(
        (F.col("doc_id") % 10 != 7) & (F.col("doc_id") < 10)
    ).count()
    n_batch_replays = docs.filter(
        (F.col("doc_id") % 10 == 7) & (F.col("doc_id") < 50)
    ).count()
    assert rows["exact_corpus"][0] >= n_corpus_replays
    assert rows["exact_batch"][0] >= n_batch_replays
    assert set(rows) <= {"exact_corpus", "exact_batch", "near_corpus", "novel"}
    assert "novel" in rows  # the bulk of a real batch is novel


def test_q160_index_persisted_and_reused(spark):
    """The corpus index is written once per corpus fingerprint and the
    second call serves the SAME digests from disk (incremental-ingest
    contract: no corpus re-hash per batch)."""
    import os

    from kinesis_logs_reader_spark.operators.dedup import (
        _corpus_index_path,
        get_or_build_corpus_index,
    )

    path = _corpus_index_path(SF_DIR)
    a = get_or_build_corpus_index(spark, SF_DIR)
    assert os.path.exists(path)
    mtime = max(
        os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    )
    b = get_or_build_corpus_index(spark, SF_DIR)
    mtime2 = max(
        os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    )
    assert mtime == mtime2  # not rebuilt
    assert a.orderBy("doc_id", "band_idx").collect() == b.orderBy(
        "doc_id", "band_idx"
    ).collect()


def test_q160_index_merge_roundtrip(spark, tmp_path):
    """Index write path: merging an admitted batch produces a new
    version whose digests make those docs exact_corpus on the next
    admission pass (the grow-the-corpus loop closes)."""
    from kinesis_logs_reader_spark.operators.dedup import (
        _corpus_index_path,
        _doc_band_rows,
        get_or_build_corpus_index,
        merge_batch_into_index,
    )

    base_path = _corpus_index_path(SF_DIR)
    get_or_build_corpus_index(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch = docs.filter(
        (F.col("doc_id") % 10 == 7) & (F.col("doc_id") < 200)
    ).select("doc_id", "text")
    newp = merge_batch_into_index(spark, base_path, batch, "t1")
    assert newp != base_path
    new_idx = spark.read.parquet(newp)
    old_idx = spark.read.parquet(base_path)
    # old rows all present, new content digests all present
    assert new_idx.count() == old_idx.count() + batch.count() * 5
    merged_content = new_idx.filter(F.col("band_idx") == -1).select("digest")
    batch_content = batch.select(F.md5("text").alias("digest"))
    assert (
        batch_content.join(merged_content, "digest", "left_anti").count() == 0
    )
    # a re-admission of the same batch against the NEW index is all
    # exact-dup: every content digest hits
    again = batch_content.join(
        merged_content.distinct(), "digest", "left_semi"
    ).count()
    assert again == batch.select("digest" if "digest" in batch.columns else "doc_id").count()
