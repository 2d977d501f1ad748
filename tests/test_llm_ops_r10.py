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


# --- q190: OPQ-style balanced-variance rotation -------------------------


def test_q190_report_shape_and_conservation(spark):
    from kinesis_logs_reader_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        q190_opq_rotation,
    )

    rows = q190_opq_rotation(spark, SF_DIR).collect()
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    assert {r.sub for r in rows} == set(range(_PQ_M))
    for r in rows:
        assert 0 <= r.code < _PQ_K
        assert r.n_vecs > 0 and r.mean_d2 >= 0 and r.max_d2 >= r.mean_d2
    per_sub = {}
    for r in rows:
        per_sub[r.sub] = per_sub.get(r.sub, 0) + r.n_vecs
    assert all(v == n_corpus for v in per_sub.values()), per_sub


def test_q190_permutation_balances_subspace_variance(spark):
    """The point of the rotation: the per-subspace variance spread
    under the round-robin allocation must not exceed the contiguous
    slicing q185 uses (it is roughly 2-3x tighter on the fixtures)."""
    from kinesis_logs_reader_spark.operators.similarity import (
        _PQ_M,
        _PQ_SUBDIM,
        _opq_permutation,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding")
    grid = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * 1024 + F.lit(0.5)).cast("bigint"),
    )
    vn = {
        r["dim"]: r["vn"]
        for r in emb.select(F.posexplode(grid).alias("dim", "q"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("q") * F.col("q")).alias("sq"),
            F.sum("q").alias("s"),
        )
        .select(
            "dim", (F.col("n") * F.col("sq") - F.col("s") * F.col("s")).alias("vn")
        )
        .collect()
    }
    perm = _opq_permutation(spark, SF_DIR)
    assert sorted(perm) == list(range(len(vn))), "must be a permutation"
    rot = [
        sum(vn[d] for d in perm[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM])
        for s in range(_PQ_M)
    ]
    plain = [
        sum(vn[d] for d in range(s * _PQ_SUBDIM, (s + 1) * _PQ_SUBDIM))
        for s in range(_PQ_M)
    ]
    assert max(rot) - min(rot) <= max(plain) - min(plain)


# --- q191: eval-split regeneration --------------------------------------


def test_q191_regenerated_manifest_is_leakage_safe(spark):
    """Every regenerated pick must sit in 'test' under the cluster-safe
    assignment — the property whose violation triggered regeneration."""
    from kinesis_logs_reader_spark.operators.curation import (
        q191_eval_split_regen,
    )
    from kinesis_logs_reader_spark.operators.dedup import (
        cluster_safe_assignment,
    )

    regen = q191_eval_split_regen(spark, SF_DIR)
    assign = cluster_safe_assignment(spark, SF_DIR).select("doc_id", "split")
    bad = regen.join(assign, "doc_id").filter(F.col("split") != "test")
    assert bad.isEmpty()


def test_q191_status_vs_original_manifest(spark):
    """'kept' rows are exactly the regenerated picks present in q178's
    original manifest; 'replacement' rows are new; both statuses occur
    on the fixture corpus; per-cell quota is min(2, n_eligible)."""
    from collections import Counter

    from kinesis_logs_reader_spark.operators.curation import (
        q178_stratified_eval_sample,
        q191_eval_split_regen,
    )

    rows = q191_eval_split_regen(spark, SF_DIR).collect()
    orig = {
        r.doc_id for r in q178_stratified_eval_sample(spark, SF_DIR).collect()
    }
    statuses = Counter(r.status for r in rows)
    assert statuses["kept"] > 0 and statuses["replacement"] > 0, statuses
    cells = {}
    for r in rows:
        assert (r.status == "kept") == (r.doc_id in orig), r
        assert 1 <= r.rank <= 2 and r.n_eligible >= 1
        cells.setdefault((r.len_bucket, r.difficulty_decile), []).append(r)
    for cell, members in cells.items():
        assert len(members) == min(2, members[0].n_eligible), (cell, members)


# --- q151b: candidate-volume forecast ------------------------------------


def test_q151b_forecast_dominates_realized_pairs(spark):
    """Sum of per-band C(n,2) forecasts must upper-bound the realized
    distinct candidate-pair count (every q46 pair collides in >= 1
    band; pairs colliding in several bands are counted once per band
    by the forecast). Occupancy columns must tie out."""
    from kinesis_logs_reader_spark.operators.dedup import (
        _planted_docs,
        q151b_candidate_volume,
    )
    from kinesis_logs_reader_spark.operators.dedup import (
        _cached_minhash_pairs,
    )

    rows = q151b_candidate_volume(spark, SF_DIR).collect()
    assert {r.band_idx for r in rows} == {0, 1, 2, 3}
    n_corpus = _planted_docs(spark, SF_DIR).count()
    for r in rows:
        assert r.n_docs <= n_corpus
        assert r.n_buckets <= r.n_docs
        assert r.max_bucket >= 1
        assert r.pairs_forecast >= 0
    realized = _cached_minhash_pairs(spark, SF_DIR).count()
    assert sum(r.pairs_forecast for r in rows) >= realized
    # planted exact copies guarantee at least one colliding bucket
    assert any(r.pairs_forecast > 0 for r in rows)


# --- q192: training-shard manifest ---------------------------------------


def test_q192_shard_plan_conservation_and_contiguity(spark):
    """Token conservation (sum of shard tokens == corpus tokens),
    offset contiguity (each shard's start == previous shard's...
    start_offset < end_offset, shards ordered and non-overlapping by
    START offsets), and budget law: every shard except possibly the
    last STARTS inside its own budget window (start_offset div budget
    == shard_id)."""
    from kinesis_logs_reader_spark.operators.preprocess import q192_shard_plan

    budget = 2048
    rows = q192_shard_plan(spark, SF_DIR).collect()
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_tokens for r in rows) == total
    prev_end = 0
    for r in rows:
        assert r.start_offset // budget == r.shard_id
        assert r.start_offset >= prev_end - 0  # doc-contiguous layout
        assert r.start_offset < r.end_offset
        # starts are monotone: this shard starts exactly where the
        # previous shard's token stream ended (document-contiguous)
        assert r.start_offset == prev_end
        prev_end = r.end_offset
    assert prev_end == total


def test_q192_deterministic_across_partitionings(spark):
    """The manifest must be invariant to the physical partition count
    (the point of the two-phase prefix sum): 8-partition and
    3-partition sessions agree row-for-row."""
    from kinesis_logs_reader_spark.operators.preprocess import q192_shard_plan

    a = [tuple(r) for r in q192_shard_plan(spark, SF_DIR).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.__dict__.pop("_klrs_q192_cache", None)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in q192_shard_plan(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.__dict__.pop("_klrs_q192_cache", None)
    assert a == b


# --- q193: exact mixture-sampling plan -----------------------------------


def test_q193_quotas_sum_to_budget_and_draw_is_valid(spark):
    """Hamilton apportionment exactness: quotas sum to exactly the
    budget; n_drawn == min(quota, n_docs); shortfall only where quota
    exceeds the source population; the drawn checksum is reproducible
    (two calls agree)."""
    from kinesis_logs_reader_spark.operators.curation import q193_mixture_plan

    rows = q193_mixture_plan(spark, SF_DIR).collect()
    assert sum(r.quota for r in rows) == 300
    for r in rows:
        assert r.n_drawn == min(r.quota, r.n_docs), r
        assert r.shortfall == r.quota - r.n_drawn, r
        assert r.shortfall >= 0
        assert (r.draw_checksum > 0) == (r.n_drawn > 0)
    again = q193_mixture_plan(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_q193_upsamples_tail_relative_to_proportional(spark):
    """The temperature rule's point: vs proportional allocation, no
    tail source (below-average size) gets LESS than its proportional
    share rounded down, and the largest source gets no more than
    proportional."""
    from kinesis_logs_reader_spark.operators.curation import q193_mixture_plan

    rows = q193_mixture_plan(spark, SF_DIR).collect()
    total_docs = sum(r.n_docs for r in rows)
    biggest = max(rows, key=lambda r: r.n_docs)
    assert biggest.quota <= 300 * biggest.n_docs / total_docs + 1
    smallest = min(rows, key=lambda r: r.n_docs)
    assert smallest.quota >= 300 * smallest.n_docs // total_docs


# --- shared unigram-scored frame -----------------------------------------


def test_cached_unigram_scored_reused_and_exact(spark):
    """The five consumers (q115/q152/q152b/q178/q191→q181) must share
    ONE persisted scored frame, and its values must equal the from-
    scratch two-pass computation."""
    from kinesis_logs_reader_spark.functions.text import tokens
    from kinesis_logs_reader_spark.operators.textstats import (
        cached_unigram_scored,
    )

    a = cached_unigram_scored(spark, SF_DIR)
    assert a is cached_unigram_scored(spark, SF_DIR)
    assert a.storageLevel.useMemory
    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("tot"))
    lp = counts.crossJoin(F.broadcast(total)).select(
        "t",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("tot").cast("double"))
            * 1e6
        ).cast("bigint").alias("lp_q"),
    )
    truth = (
        tok.join(lp, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("lp_q").alias("sum_lp_q"),
        )
    )
    got = a.select("doc_id", "n_tok", "sum_lp_q")
    assert got.exceptAll(truth).isEmpty() and truth.exceptAll(got).isEmpty()


# --- q61 lexer-count equivalence fuzz --------------------------------------


def test_q61_translate_count_equals_alternation_regex(spark):
    """The r10 q61 rewrite claims the translate+run-collapse token
    count is equivalent to regexp_count("[a-z]+|[0-9]+|[^a-z0-9 ]")
    for ANY input — measure it on a nasty corpus (uppercase, mixed
    runs, punctuation, tabs/newlines, multi-byte unicode, emoji,
    leading/trailing/multiple spaces), not just the fixture alphabet."""
    import string

    nasty = [
        "", " ", "   ", "a", "A", "aA1!b", "abc123 def",
        "ABC abc AbC", "a  b   c", " lead", "trail ", "a\tb\nc",
        "é ü ß", "中文 文本", "🦆🦆 x", "0 00 a0a 0a0",
        "!!!", "a!b?c.d", "x" * 200, ("ab1 " * 60).strip(),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(nasty)], "doc_id long, text string"
    )
    _src = string.ascii_lowercase + string.digits
    _dst = "a" * 26 + "0" * 10
    _other = "".join(
        chr(i) for i in range(32, 127) if chr(i) not in _src + " "
    )
    collapsed = F.translate(
        F.translate(F.col("text"), _src, _dst), _other, "s" * len(_other)
    )
    runs = F.regexp_replace(F.regexp_replace(collapsed, "a+", "a"), "0+", "0")
    got = df.select(
        "doc_id",
        F.length(F.regexp_replace(runs, " ", "")).cast("int").alias("n"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("int")
        .alias("want"),
    ).collect()
    for r in got:
        assert r.n == r.want, (nasty[r.doc_id], r.n, r.want)
