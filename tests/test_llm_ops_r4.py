"""Semantic tests for the round-4 LLM-pipeline batch (q110-q116) —
properties the SQL oracle's value hash cannot express: fusion sanity,
quantizer invariants, planted-duplicate recovery, containment math.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import curation, dedup, preprocess, similarity, textstats
from kinesis_logs_reader_spark.functions.text import tokens
from kinesis_logs_reader_spark.sources import tables
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR, SF_DIR_01


def test_rrf_query_doc_ranks_first_on_cosine(spark):
    """The query vector (vec 0) has cosine 1.0 with itself, so doc 0
    must carry rank_cos == 1 and appear in the fused top-20."""
    rows = {r.doc_id: r for r in curation.q110_rrf_hybrid(spark, SF_DIR).collect()}
    assert 0 in rows and rows[0].rank_cos == 1
    # rrf must equal the definition from the two ranks
    for r in rows.values():
        expect = 1.0 / (60 + r.rank_cos) + (
            1.0 / (60 + r.rank_bm25) if r.rank_bm25 is not None else 0.0
        )
        assert math.isclose(r.rrf, round(expect, 6), abs_tol=1e-9)


def test_rrf_is_top20_by_score(spark):
    out = curation.q110_rrf_hybrid(spark, SF_DIR)
    assert out.count() == 20


def test_quantizer_saturates_exactly_at_max(spark):
    """The element with |x| == max|x| must quantize to +-127, so every
    vector has n_sat >= 1; codes never exceed 127 so the L1 mass is
    bounded by 127 * dim."""
    rows = preprocess.q111_embedding_quantize(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_sat >= 1
        assert r.scale > 0
        assert r.code_l1 <= 127 * 64


def test_chunk_dedup_flags_planted_copy(spark):
    """Two identical documents -> every chunk of each is duplicated."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    cw = 2
    tokd = df.select("doc_id", tokens().alias("_toks"))
    n_chunks = F.ceil(F.size("_toks") / F.lit(float(cw))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(F.col("_toks"), i * cw + 1, cw), " "),
    )
    hashed = tokd.select("doc_id", F.explode(chunks).alias("chunk")).select(
        "doc_id", F.md5("chunk").alias("h")
    )
    counts = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = {
        r.doc_id: (r.n, r.dup)
        for r in hashed.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("n_occ") > 1).cast("int")).alias("dup"),
        )
        .collect()
    }
    assert per_doc[1] == (2, 2) and per_doc[2] == (2, 2)
    assert per_doc[3] == (2, 0)


def test_chunk_dedup_ratio_bounds(spark):
    rows = dedup.q112_chunk_dedup(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert 0.0 <= r.dup_ratio <= 1.0


def test_chunk_dedup_corpus_precondition(spark):
    """q112's regex chunker (``\\S+( \\S+)?`` + ``length(text)>0``) is
    equivalent to the slice-based oracle ONLY for non-empty,
    single-space-tokenized text (ADVICE r5): empty docs, runs of
    spaces, or leading/trailing spaces would make the two chunkings
    diverge. Check the documented precondition on every fixture the
    parity gate reads instead of assuming it."""
    for d in (SF_DIR, SF_DIR_01):
        bad = (
            tables.load_table(spark, d, "documents")
            .filter(
                (F.length("text") == 0)
                | F.col("text").contains("  ")
                | F.col("text").startswith(" ")
                | F.col("text").endswith(" ")
            )
            .count()
        )
        assert bad == 0, f"{d}: {bad} docs violate q112 chunker precondition"


def test_blocklist_blocks_whole_sources(spark):
    rows = {r.source: r for r in curation.q113_blocklist_filter(spark, SF_DIR).collect()}
    for s in ("src3", "src7", "src13"):
        assert rows[s].n_blocked == rows[s].n_docs
        assert rows[s].n_kept == 0
    assert rows["src0"].n_blocked == 0


def test_mixture_weights_normalize_and_flatten(spark):
    """Weights sum to ~1 and alpha<1 compresses the spread: the
    max/min weight ratio must be <= the max/min count ratio."""
    rows = curation.q114_mixture_weights(spark, SF_DIR).collect()
    assert math.isclose(sum(r.weight for r in rows), 1.0, abs_tol=1e-4)
    w_ratio = max(r.weight for r in rows) / min(r.weight for r in rows)
    n_ratio = max(r.n_docs for r in rows) / min(r.n_docs for r in rows)
    assert w_ratio <= n_ratio + 1e-9


def test_unigram_lm_prefers_frequent_tokens(spark):
    """A doc of corpus-frequent tokens must outscore a doc that is the
    same plus rare tokens — checked via the per-token quantized table
    embedded in q115's own output (monotonicity on real docs is not
    guaranteed, so assert the defining bound instead: every score is
    <= ln(1/ n_distinct_most_common) upper bound and < 0)."""
    rows = textstats.q115_unigram_lm(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.avg_logprob < 0
        assert r.keep == (r.avg_logprob > -3.4)


def test_containment_dominates_jaccard(spark):
    """For every candidate pair, containment >= jaccard (min <= union)."""
    tokd = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", tokens().alias("_toks"))
    )
    stats = dedup.shingle_pair_counts(tokd).collect()
    assert len(stats) > 0
    for r in stats:
        jac = r.common / (r.na + r.nb - r.common)
        cont = r.common / min(r.na, r.nb)
        assert cont >= jac - 1e-12


def test_containment_full_for_embedded_doc(spark):
    """A short doc fully embedded in a longer one has containment 1."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z z a b c d e f q q")],
        "doc_id long, text string",
    )
    tokd = df.select("doc_id", tokens().alias("_toks"))
    [r] = dedup.shingle_pair_counts(tokd).collect()
    assert r.common == min(r.na, r.nb)


def test_zipf_fit_negative_slope(spark):
    """Token frequencies decay with rank, so the fitted slope must be
    negative. The synthetic vocab is ~31 tokens, so the top-100 cap
    leaves the whole vocabulary in the fit."""
    [r] = curation.q117_zipf_fit(spark, SF_DIR).collect()
    assert 10 <= r.n <= 100
    assert r.zipf_slope < 0


def test_canonical_select_planted_variant_wins(spark):
    """The uppercased double-spaced variant of docs 0-14 is longer than
    the original, so id+2000000 must be the kept doc for those groups
    and the original ids 0-14 must NOT survive."""
    kept = {r.doc_id for r in dedup.q118_canonical_select(spark, SF_DIR).collect()}
    for i in range(15):
        assert i + 2000000 in kept
        assert i not in kept


def test_knn_join_matches_single_query_topk(spark):
    """q119's rows for query_id 0 must equal q43-style exact top-k over
    the same candidate set (vec_id >= 10)."""
    from kinesis_logs_reader_spark.operators.similarity import cosine

    emb = load_table(spark, SF_DIR, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    expect = (
        emb.filter(F.col("vec_id") >= 10)
        .join(F.broadcast(q0))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(3)
        .collect()
    )
    got = (
        similarity.q119_knn_join(spark, SF_DIR)
        .filter(F.col("query_id") == 0)
        .orderBy("rn")
        .collect()
    )
    assert [(r.vec_id, r.sim) for r in got] == [(r.vec_id, r.sim) for r in expect]


def test_quantizer_matches_numpy_reference(spark):
    """The Spark HOF quantizer chain must agree with a straight numpy
    implementation of the same definition on random vectors."""
    import numpy as np

    rng = np.random.RandomState(42)
    vecs = rng.randn(50, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    amax = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    staged = df.select("vec_id", amax.alias("_amax"), "embedding").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(
                (v.cast("double") * 127.0) / F.col("_amax") + 0.5
            ).cast("bigint"),
        ).alias("codes"),
    )
    got = {r.vec_id: list(r.codes) for r in staged.collect()}
    for i in range(50):
        x = vecs[i].astype(np.float64)
        a = np.abs(x).max()
        expect = np.floor((x * 127.0) / a + 0.5).astype(np.int64)
        assert got[i] == expect.tolist()


def test_zipf_fit_matches_numpy_ols(spark):
    """q117's integer-moment OLS must equal numpy's lstsq on the same
    quantized (ln rank, ln freq) points."""
    import math as m

    import numpy as np

    docs = load_table(spark, SF_DIR, "documents")
    counts = sorted(
        (
            (r.c, r.t)
            for r in docs.select(F.explode(tokens()).alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ),
        key=lambda rc: (-rc[0], rc[1]),
    )[:100]
    xq = np.array([m.floor(m.log(i + 1) * 1e6) for i in range(len(counts))])
    yq = np.array([m.floor(m.log(c) * 1e6) for c, _ in counts])
    slope_ref, intercept_ref = np.polyfit(xq.astype(float), yq.astype(float), 1)
    [r] = curation.q117_zipf_fit(spark, SF_DIR).collect()
    assert abs(r.zipf_slope - slope_ref) < 1e-3
    assert abs(r.zipf_intercept - intercept_ref / 1e6) < 1e-3


def test_bpe_pair_counts_top_pair_is_true_max(spark):
    """q120's rank-1 pair must match a driver-side exact count."""
    from collections import Counter

    texts = [r.text for r in load_table(spark, SF_DIR, "documents").collect()]
    counts = Counter()
    for t in texts:
        toks = t.split(" ")
        counts.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    [top] = curation.q120_bpe_pair_counts(spark, SF_DIR).filter(F.col("rank") == 1).collect()
    assert (top.pair, top.n) == best
    assert top.merged == top.pair.replace(" ", "")


def test_lang_confusion_rows_sum_to_one(spark):
    """Each truth row's fractions must sum to ~1 and the matrix totals
    must equal q51's per-doc prediction counts. (The synthetic corpus
    shares one vocabulary across langs, so classifier accuracy itself
    is poor — the matrix CONTRACT, not the classifier, is under test.)
    """
    rows = textstats.q121_lang_confusion(spark, SF_DIR).collect()
    by_truth: dict[str, list] = {}
    for r in rows:
        by_truth.setdefault(r.true_lang, []).append(r)
    for cells in by_truth.values():
        assert abs(sum(c.frac_of_truth for c in cells) - 1.0) < 1e-2
    n_preds = textstats.q51_lang_id(spark, SF_DIR).count()
    assert sum(r.n for r in rows) == n_preds


def test_substring_dedup_planted_copy_is_one_full_span(spark):
    """A full-copy pair duplicates EVERY k-gram position, so both the
    planted doc and its original must report exactly one span covering
    positions 0 .. n_tokens-k."""
    out = {r.doc_id: r for r in dedup.q122_substring_dedup(spark, SF_DIR).collect()}
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 10)
        .collect()
    }
    for i, nt in toks.items():
        for did in (i, i + 3000000):
            r = out[did]
            assert r.n_spans == 1
            assert r.first_dup_pos == 0
            assert r.last_dup_pos == nt - 8
            assert r.n_dup_pos == nt - 7


def test_minhash_estimate_is_eighths_and_exact_for_copies(spark):
    """Estimates move in 1/8 steps; an exact-duplicate pair has
    identical signatures, so est must be exactly 1.0."""
    rows = dedup.q123_minhash_accuracy(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert abs(r.est * 8 - round(r.est * 8)) < 1e-9
        assert abs(r.abs_err - round(abs(r.jaccard - r.est), 6)) < 1e-9
    # planted identical docs: build a tiny frame through the same kernel
    from kinesis_logs_reader_spark.functions.text import (
        minhash_signature,
        token_base_hashes,
        token_shingle_hashes,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    sig = (
        df.select("doc_id", token_base_hashes().alias("tb"))
        .select("doc_id", token_shingle_hashes(F.col("tb")).alias("bases"))
        .select("doc_id", *minhash_signature(F.col("bases"), num_hashes=8))
        .collect()
    )
    s1, s2 = ([r[f"mh{j}"] for j in range(8)] for r in sig)
    assert s1 == s2


def test_chunk_roundtrip_all_ok(spark):
    """Every document must reconstruct byte-identically from its
    chunks — the audit column is all-true by construction."""
    rows = preprocess.q124_reconstruct_chunks(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.roundtrip_ok for r in rows)


def test_dsir_top_selection_is_target_tilted(spark):
    """The DSIR top-20 must be tilted toward the target domain: the
    mean score of 'en' docs must exceed the mean of non-'en' docs
    corpus-wide, and the top-20 en share must be >= the corpus share."""
    top = curation.q125_dsir_sampling(spark, SF_DIR).collect()
    assert len(top) == 20
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    top_en = sum(1 for r in top if r.lang == "en")
    assert top_en / 20 >= n_en / n


def test_length_buckets_conserve_tokens(spark):
    """Bucket >= every member's length (pad_tokens >= 0) and the
    bucketed token total must equal the corpus token total."""
    rows = curation.q126_length_buckets(spark, SF_DIR).collect()
    assert all(r.pad_tokens >= 0 for r in rows)
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.select(F.sum(F.size(tokens())).alias("t")).collect()[0].t
    assert sum(r.real_tokens for r in rows) == total
    for r in rows:
        assert r.bucket & (r.bucket - 1) == 0  # power of two


def test_centroid_classify_beats_chance(spark):
    """10 labels -> chance accuracy is 0.1; centroid routing on the
    synthetic clustered embeddings must beat it on every label, and
    counts must partition the corpus."""
    rows = similarity.q127_centroid_classify(spark, SF_DIR).collect()
    emb_n = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == emb_n
    for r in rows:
        assert 0 <= r.n_correct <= r.n_vecs
        assert r.accuracy > 0.1


def test_split_leakage_detects_planted_cross_split_dups(spark):
    """The planted copies (id+1000000) hash to independent splits, so
    with 20 planted pairs some must cross a split boundary — the audit
    must report at least one leaking cell, and leaking must be exactly
    split_a != split_b."""
    rows = dedup.q128_split_leakage(spark, SF_DIR).collect()
    assert any(r.leaking and r.n_pairs > 0 for r in rows)
    for r in rows:
        assert r.leaking == (r.split_a != r.split_b)


def test_dedup_pipeline_monotone_and_removes_planted(spark):
    """Counts must be monotone (raw >= after_exact >= after_near) and
    the planted exact copies must be removed: total survivors after
    the exact stage equal the raw corpus size (500 docs), with 20
    planted copies gone."""
    rows = dedup.q129_dedup_pipeline(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_raw >= r.n_after_exact >= r.n_after_near
        assert 0.0 <= r.removed_frac <= 1.0
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_raw for r in rows) == n_docs + 20
    assert sum(r.n_after_exact for r in rows) == n_docs


def test_session_caches_are_keyed_by_corpus(spark):
    """The persisted shingle/pair caches key by sf_dir: two corpora in
    one session must yield independent frames (a key bug would serve
    the first corpus's shingles for the second — silently wrong)."""
    from tests.conftest import SF_DIR_01

    a = dedup._cached_slice_shingles(spark, SF_DIR_01)
    b = dedup._cached_slice_shingles(spark, SF_DIR)
    def digest(df):
        rows = df.select(
            F.md5(F.concat_ws("|", F.col("sh"))).alias("h")
        ).collect()
        return sorted(r.h for r in rows)

    da, db = digest(a), digest(b)
    # same slice size (both dirs hold 500 docs) but different content
    assert len(da) == len(db)
    assert da != db


def test_span_decontam_consistent_with_doc_level(spark):
    """Every training doc flagged at span level must also be flagged
    by q89's doc-level check over the same 3-gram space, span counts
    are positive, and positions are ordered."""
    span_docs = {r.train_id for r in dedup.q130_span_decontamination(spark, SF_DIR).collect()}
    doc_level = {r.train_id for r in dedup.q89_decontamination(spark, SF_DIR).collect()}
    assert span_docs <= doc_level
    for r in dedup.q130_span_decontamination(spark, SF_DIR).collect():
        assert r.n_spans >= 1
        assert r.first_pos <= r.last_pos


def test_md5_sampling_is_repartition_stable(spark):
    """The md5-coin samplers (q77 split, q93 domain mix) must select
    the SAME rows regardless of physical partitioning — the
    reproducibility contract rand()-based sampling cannot give."""
    from kinesis_logs_reader_spark.operators.curation import q93_domain_mix
    from kinesis_logs_reader_spark.operators.preprocess import q77_hash_split

    for fn in (q77_hash_split, q93_domain_mix):
        base = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            alt = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert base == alt


def test_table_profile_matches_direct_queries(spark):
    """Profile rows must agree with directly-computed stats."""
    from kinesis_logs_reader_spark.operators.sqlsurface import q131_table_profile

    rows = {r.column_name: r for r in q131_table_profile(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    n_distinct = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    assert rows["o_custkey"].n_distinct == n_distinct
    assert rows["o_orderkey"].n_nulls == 0
    mn = orders.agg(F.min("o_orderkey")).collect()[0][0]
    assert rows["o_orderkey"].min_str == str(mn)
