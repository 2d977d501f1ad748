"""Semantic tests for the round-10 changes: the q189 Jaccard
small-union exactness fix, the q45b fingerprint production twin, the
shared canonical-digest session cache, the pq_encode broadcast
memoization, and the q186 degenerate-corpus guard — invariants the SQL
oracle's value hash cannot express.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import similarity, textstats
from kinesis_logs_reader_spark.operators.dedup import q189_kmv_overlap
from kinesis_logs_reader_spark.operators.preprocess import (
    cached_canonical_digests,
)
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


# --- q189: /m denominator makes the small-union regime exact ---------


def test_q189_jaccard_exact_when_union_fits_sketch(spark, tmp_path):
    """When the true union is smaller than k=32 the merged sketch IS
    the union, so BOTH estimates must be exact — union_est was always
    handled (m<k branch); r10 fixed jacc_est to divide by m instead of
    the constant k (ADVICE r9 item 1: two sources with 10 shared docs
    out of 15 distinct must report 333333 ppm, not a k-biased 156250).
    The sf0.001 corpus never hits m<k, so the regime gets a
    constructed corpus: |A|=|B|=10, |A∩B|=5, |A∪B|=15 < 32."""
    sf_dir = str(tmp_path)
    rows_in = [(i, f"shared doc {i}", "src_a") for i in range(5)]
    rows_in += [(10 + i, f"only a {i}", "src_a") for i in range(5)]
    rows_in += [(20 + i, f"shared doc {i}", "src_b") for i in range(5)]
    rows_in += [(30 + i, f"only b {i}", "src_b") for i in range(5)]
    spark.createDataFrame(
        rows_in, "doc_id long, text string, source string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = q189_kmv_overlap(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.union_exact == 15 and r.inter_exact == 5
    assert r.union_est == r.union_exact, r
    assert r.jacc_est_ppm == r.jacc_exact_ppm == 333_333, r


def test_q189_jaccard_bounded(spark):
    for r in q189_kmv_overlap(spark, SF_DIR).collect():
        assert 0 <= r.jacc_est_ppm <= 1_000_000, r


# --- q45b: fingerprint production twin --------------------------------


def test_q45b_ties_out_with_corpus_and_q45(spark):
    docs = load_table(spark, SF_DIR, "documents")
    truth_n = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = textstats.q45b_fingerprint_agg(spark, SF_DIR).collect()
    assert {r.source for r in rows} == set(truth_n)
    for r in rows:
        assert r.n_docs == truth_n[r.source]
        assert 1 <= r.n_exact_fp <= r.n_docs
        assert 1 <= r.n_shingle_fp <= r.n_docs
        assert r.n_dup_exact == r.n_docs - r.n_exact_fp
    # the twin's distinct exact fingerprints must agree with q45's
    # per-doc frame joined back to source (same kernel, new shape)
    q45 = textstats.q45_fingerprint(spark, SF_DIR).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    truth_fp = {
        r["source"]: r["n"]
        for r in q45.groupBy("source")
        .agg(F.countDistinct("exact_fp").alias("n"))
        .collect()
    }
    assert {r.source: r.n_exact_fp for r in rows} == truth_fp


# --- shared canonical-digest frame ------------------------------------


def test_cached_canonical_digests_reused(spark):
    a = cached_canonical_digests(spark, SF_DIR)
    b = cached_canonical_digests(spark, SF_DIR)
    assert a is b, "second call must return the same persisted frame"
    assert a.storageLevel.useMemory, "frame must be persisted"


def test_cached_digest_columns_tie_out_with_raw_text(spark):
    """The cached ints must equal the from-raw-text expressions q90's
    quality formula previously used — bit-identity of the derived
    double depends on it."""
    from kinesis_logs_reader_spark.functions.text import (
        n_tokens,
        stopword_count,
    )
    from kinesis_logs_reader_spark.operators.preprocess import normalize_text

    docs = load_table(spark, SF_DIR, "documents")
    truth = docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        n_tokens().alias("nt"),
        stopword_count().alias("n_stop"),
        F.md5(normalize_text(F.col("text"))).alias("h"),
    )
    dig = cached_canonical_digests(spark, SF_DIR).select(
        "doc_id", "text_len", "nt", "n_stop", "h"
    )
    assert dig.exceptAll(truth).isEmpty() and truth.exceptAll(dig).isEmpty()


# --- pq_encode broadcast memoization -----------------------------------


def test_pq_encode_broadcast_memoized(spark):
    """q185/q187/q188 each call pq_encode; the codebook broadcast must
    be created once per codebook content, not once per call (ADVICE r9
    item 2)."""
    from kinesis_logs_reader_spark.operators.similarity import (
        _pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    books = _pq_codebooks(spark, SF_DIR)
    spark.__dict__.pop("_klrs_pq_bcast_cache", None)
    pq_encode(emb, books)
    cache1 = dict(spark.__dict__["_klrs_pq_bcast_cache"])
    pq_encode(emb, books)
    cache2 = spark.__dict__["_klrs_pq_bcast_cache"]
    assert len(cache2) == 1
    (k1, v1), (k2, v2) = cache1.popitem(), dict(cache2).popitem()
    assert k1 == k2 and v1 is v2, "same codebooks must reuse the broadcast"


# --- q186 degenerate-corpus guard --------------------------------------


def test_q186_raises_cleanly_on_all_zero_corpus(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, [0.0] * 8) for i in range(16)], "vec_id long, embedding array<double>"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="empty or all-zero"):
        similarity.q186_int8_recall(spark, sf_dir)
