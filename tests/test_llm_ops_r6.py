"""Semantic tests for the round-4 batch-9/10 operators (q144-q151) —
invariants the SQL oracle's value hash cannot express: entropy bounds
and degenerate-document behavior, OOV/vocab accounting, threshold-sweep
monotonicity, the bigram model's word-order sensitivity, planted
template recovery, per-source signature shape, charset partition
completeness, and pair/degree accounting.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import dedup, textstats

from tests.conftest import SF_DIR


def _planted_corpus(spark, tmp_path, rows):
    """Write a tiny documents.parquet corpus and return its dir."""
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_entropy_bounds_and_degenerate_docs(spark, tmp_path):
    """Constant doc -> entropy 0; all-distinct doc -> entropy == ln(n)
    (norm_entropy == 1); mixed doc strictly between. Upper bound
    ln(n_distinct) holds corpus-wide (+1 ulp of quantization slack)."""
    d = _planted_corpus(
        spark,
        tmp_path,
        [
            (1, "x x x x x x x x"),
            (2, "a b c d e f g h"),
            (3, "a a a a b b c d"),
        ],
    )
    rows = {r.doc_id: r for r in textstats.q144_token_entropy(spark, d).collect()}
    assert rows[1].entropy == 0.0 and rows[1].norm_entropy == 0.0
    assert abs(rows[2].entropy - round(math.log(8), 4)) < 1e-3
    assert abs(rows[2].norm_entropy - 1.0) < 1e-3
    assert 0.0 < rows[3].entropy < rows[2].entropy
    corpus = textstats.q144_token_entropy(spark, SF_DIR).collect()
    assert all(r.entropy >= 0.0 for r in corpus)
    assert all(
        r.entropy <= math.log(max(r.n_distinct, 2)) + 1e-3 for r in corpus
    )


def test_oov_accounting_against_exact_recount(spark):
    """oov_tokens + in-vocab tokens == total_tokens per language, and
    the corpus-wide totals reconcile with a direct token count."""
    rows = textstats.q145_oov_rate(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(0.0 <= r.oov_rate <= 1.0 for r in rows)
    assert all(r.oov_tokens <= r.total_tokens for r in rows)
    from kinesis_logs_reader_spark.sources.tables import load_table

    total = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .count()
    )
    assert sum(r.total_tokens for r in rows) == total


def test_threshold_sweep_is_monotone_nonincreasing(spark):
    """Raising the Jaccard cutoff can only shrink the hit set: both
    n_pairs and n_docs_affected are non-increasing in threshold, and
    docs-affected is bounded by 2*pairs (a pair touches 2 docs)."""
    rows = dedup.q146_jaccard_threshold_sweep(spark, SF_DIR).collect()
    assert [r.threshold for r in rows] == [0.3, 0.5, 0.7, 0.9]
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert all(d <= 2 * p for p, d in zip(pairs, docs))


def test_bigram_lm_penalizes_shuffled_word_order(spark, tmp_path):
    """The discriminator the unigram model cannot express: repeat a
    frequent phrase to train the model, then score (a) another copy of
    the phrase and (b) the same WORDS in scrambled order. Identical
    unigrams, but the scrambled doc's bigrams are unseen (add-1 floor),
    so its avg_logprob must be strictly lower."""
    phrase = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy fox brown jumps the"
    rows_src = [(i, phrase) for i in range(1, 9)]
    rows_src.append((100, phrase))
    rows_src.append((101, scrambled))
    d = _planted_corpus(spark, tmp_path, rows_src)
    rows = {r.doc_id: r for r in textstats.q147_bigram_lm(spark, d).collect()}
    assert rows[100].n_bigrams == rows[101].n_bigrams
    assert rows[100].avg_logprob > rows[101].avg_logprob
    # keep is defined as avg_logprob > -6.0, whatever the corpus
    assert all(r.keep == (r.avg_logprob > -6.0) for r in rows.values())


def test_template_mining_recovers_planted_groups(spark):
    """Each planted (original, +4000000-variant, +4100000-variant)
    triple shares a digit-normalized skeleton... but the two planted
    variants append EXTRA text, so they group with each other, not the
    original. Every group must have >= 2 members and a planted
    exemplar; there are exactly 15 planted groups on this corpus."""
    from kinesis_logs_reader_spark.operators import curation

    rows = curation.q148_template_mining(spark, SF_DIR).collect()
    planted = [r for r in rows if r.exemplar_id >= 4000000]
    assert len(planted) == 15
    assert all(r.n_docs >= 2 for r in rows)


def test_source_signature_is_top3_per_source(spark):
    """Exactly 3 ranked terms per source, ranks 1..3, lifts
    non-increasing within a source."""
    from kinesis_logs_reader_spark.operators import curation

    rows = curation.q149_source_signature(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert [r.rank for r in rs] == [1, 2, 3]
        lifts = [r.log_odds for r in rs]
        assert lifts == sorted(lifts, reverse=True)


def test_charset_profile_partitions_every_char(spark):
    """alpha + digit + space + other == n_chars row-wise, and ratios
    stay in [0, 1]."""
    rows = textstats.q150_charset_profile(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_alpha + r.n_digit + r.n_space + r.n_other == r.n_chars
        assert 0.0 <= r.alpha_ratio <= 1.0
        assert 0.0 <= r.other_ratio <= 1.0


def test_candidate_degree_accounts_for_every_pair(spark):
    """sum(degree * n_docs) == 2 * |pairs|: every pair contributes
    exactly two endpoint-degree units."""
    from kinesis_logs_reader_spark.operators.dedup import _cached_pair_counts

    rows = dedup.q151_candidate_degree(spark, SF_DIR).collect()
    n_pairs = _cached_pair_counts(spark, SF_DIR).count()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs


def test_perplexity_buckets_partition_the_corpus(spark):
    """Deciles cover every scored doc exactly once; bucket score ranges
    are ordered (bucket i's max <= bucket i+1's min) and keep-counts
    are consistent with the -3.4 threshold falling in ONE bucket."""
    rows = textstats.q152_perplexity_buckets(spark, SF_DIR).collect()
    assert [r.bucket for r in rows] == list(range(1, 11))
    n_scored = textstats.q115_unigram_lm(spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_scored
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_lp <= hi.min_lp + 1e-9
    # keep is monotone in score: once a bucket is fully kept, all
    # higher buckets are too
    fully_kept = [r.n_keep == r.n_docs for r in rows]
    first_full = fully_kept.index(True) if True in fully_kept else len(rows)
    assert all(fully_kept[first_full:])


def test_dedup_survivorship_mirror_source_loses_share(spark):
    """The planted 'mirror' source is 100% copies of existing docs, so
    every one of its docs loses to the original's smaller doc_id:
    n_after == 0 and its share drift is maximally negative. Totals
    conserve: survivors across sources == distinct text count."""
    from kinesis_logs_reader_spark.operators import preprocess

    rows = {r.source: r for r in preprocess.q153_dedup_survivorship(spark, SF_DIR).collect()}
    assert "mirror" in rows
    m = rows["mirror"]
    assert m.n_before == 25 and m.n_after == 0
    assert m.share_drift_micro < 0
    total_after = sum(r.n_after for r in rows.values())
    from kinesis_logs_reader_spark.sources.tables import load_table

    distinct_texts = (
        load_table(spark, SF_DIR, "documents").select("text").distinct().count()
    )
    assert total_after == distinct_texts


def test_boundary_overlap_recovers_planted_splits(spark):
    """Every planted (first-half, second-half) pair must surface as a
    seam match a=id+6000000 -> b=id+6100000."""
    rows = dedup.q154_boundary_overlap(spark, SF_DIR).collect()
    pairs = {(r.a, r.b) for r in rows}
    from kinesis_logs_reader_spark.sources.tables import load_table

    eligible = (
        load_table(spark, SF_DIR, "documents")
        .where("doc_id < 10 AND size(split(text, ' ')) >= 16")
        .count()
    )
    assert eligible > 0
    planted = {(i + 6000000, i + 6100000) for i in range(10)}
    found = pairs & planted
    assert len(found) == eligible


def test_lsh_band_curve_is_monotone(spark):
    """Stricter bands (larger r) can only shrink both the candidate
    set and the recovered-planted set; the loosest scheme must recover
    a strict majority of the 30 planted ~0.66-similarity truncations
    and the strictest must recover almost none — the separation the
    tuning curve exists to show."""
    rows = dedup.q155_lsh_band_sensitivity(spark, SF_DIR).collect()
    assert [r.rows_per_band for r in rows] == [2, 4, 8]
    cands = [r.n_candidates for r in rows]
    rec = [r.n_planted_recovered for r in rows]
    assert cands == sorted(cands, reverse=True)
    assert rec == sorted(rec, reverse=True)
    assert rec[0] > 15
    assert rec[2] < 10
    assert all(r.n_planted_recovered <= r.n_candidates for r in rows)


def test_training_order_respects_weights(spark):
    """In the first 50 interleave positions, a heavier source never
    appears FEWER times than a strictly lighter one (proportional
    feeding), and per-source doc_ids appear in ascending order (the
    within-source sequence is preserved)."""
    from kinesis_logs_reader_spark.operators import curation
    from kinesis_logs_reader_spark.sources.tables import load_table

    rows = curation.q156_training_order(spark, SF_DIR).collect()
    assert [r.position for r in rows] == list(range(1, 51))
    by_src_ids = {}
    for r in rows:
        by_src_ids.setdefault(r.source, []).append(r.doc_id)
    for ids in by_src_ids.values():
        assert ids == sorted(ids)
    sizes = {
        r.source: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    appear = {s: len(ids) for s, ids in by_src_ids.items()}
    for s1 in appear:
        for s2 in appear:
            if sizes[s1] > sizes[s2] * 1.5:  # strictly heavier
                assert appear[s1] >= appear.get(s2, 0)


def test_epoch_plan_conserves_budget(spark):
    """tokens_wanted sums to <= the 1M budget (floor rounding only
    loses tokens) and within |sources| of it; epochs_micro is exactly
    floor(wanted/avail * 1e6); risk flag consistent."""
    from kinesis_logs_reader_spark.operators import curation

    rows = curation.q157_epoch_plan(spark, SF_DIR).collect()
    total = sum(r.tokens_wanted for r in rows)
    assert total <= 1_000_000
    assert total >= 1_000_000 - len(rows)
    for r in rows:
        assert r.epochs_micro == int(r.tokens_wanted * 1e6 / r.tokens_avail)
        assert r.overfit_risk == (r.epochs_micro > 4_000_000)
