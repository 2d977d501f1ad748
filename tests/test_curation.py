"""Semantic invariants of the curation operators (operators/curation.py)
that the DuckDB hash comparison can't express: exact stratum sizes,
token conservation in packing, determinism of hash-coin sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import curation
from kinesis_logs_reader_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_stratified_sample_exact_sizes(spark):
    rows = curation.q96_stratified_sample(spark, SF_DIR).collect()
    assert rows, "expected at least one stratum"
    for r in rows:
        assert r.n_kept == math.ceil(r.n_stratum * 0.1)
        assert r.id_min <= r.id_max


def test_pack_sequences_conserves_tokens(spark):
    """Bin token totals per lang must equal the corpus token totals —
    the offset-binning rule may overflow a bin but never drops/dupes."""
    packed = curation.q94_pack_sequences(spark, SF_DIR)
    per_lang = {
        r.lang: r.total
        for r in packed.groupBy("lang").agg(F.sum("bin_tokens").alias("total")).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    truth = {
        r.lang: r.total
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    assert per_lang == truth
    assert all(r.bin >= 0 for r in packed.collect())


def test_domain_mix_deterministic_and_near_target(spark):
    a = {r.source: r.n_kept for r in curation.q93_domain_mix(spark, SF_DIR).collect()}
    b = {r.source: r.n_kept for r in curation.q93_domain_mix(spark, SF_DIR).collect()}
    assert a == b, "md5-coin sampling must be reproducible"
    for r in curation.q93_domain_mix(spark, SF_DIR).collect():
        assert abs(r.eff_rate_ppm / 1e6 - r.rate_pct / 100.0) < 0.35


def test_centroid_outliers_shape(spark):
    rows = curation.q99_centroid_outliers(spark, SF_DIR).collect()
    per_label: dict[int, int] = {}
    for r in rows:
        per_label[r.label] = per_label.get(r.label, 0) + 1
        assert r.dist2_scaled >= 0
    assert all(n == 3 for n in per_label.values())


def test_gopher_passes_is_conjunction(spark):
    for r in curation.q91_gopher_rules(spark, SF_DIR).collect():
        expected = (
            r.rule_min_words
            and r.rule_max_words
            and r.rule_word_len
            and r.rule_stopwords
            and r.rule_distinct
        )
        assert r.passes == expected


def test_winnowing_coverage_bound(spark):
    """Winnowing guarantee: a selected fingerprint at position p covers
    at most w windows, so n_fps >= ceil(n_windows / w) with w=4."""
    from kinesis_logs_reader_spark.operators.dedup import q101_winnowing

    for r in q101_winnowing(spark, SF_DIR).collect():
        n_windows = max(r.n_shingles - 3, 0)
        if n_windows:
            assert r.n_fps >= math.ceil(n_windows / 4)
            assert r.n_fps <= n_windows


def test_dedup_incremental_semantics(spark):
    """Planted scenario: store knows docs 0-99; batch re-sends 50-99
    plus case/spacing variants of 0-9; only genuinely new rows admit."""
    from kinesis_logs_reader_spark.operators.preprocess import (
        dedup_incremental,
        normalize_text,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    known = docs.filter(F.col("doc_id") < 100).select(
        F.md5(normalize_text(F.col("text"))).alias("_h")
    )
    variants = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("text", F.upper(F.regexp_replace("text", " ", "  ")))
        .withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    batch = docs.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 150)
    ).unionByName(variants)
    kept = {r.doc_id for r in dedup_incremental(batch, known).collect()}
    assert kept == set(range(100, 150)), (
        "re-sent and variant rows must be rejected, new rows admitted"
    )


def test_observe_metrics_single_pass(spark):
    """Observation metrics materialize from the same single execution
    that produces the output (no re-scan)."""
    from kinesis_logs_reader_spark.operators.pipeline import curate_with_metrics
    from kinesis_logs_reader_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    curated, obs = curate_with_metrics(docs)
    n_out = curated.count()
    m = obs.get
    assert m["n_input"] == docs.count()
    assert m["total_chars"] > 0
    assert 0 < n_out <= m["n_input"]


def test_write_splits_one_pass(spark, tmp_path):
    """partitionBy split write: three split dirs from one scan, and
    the union of the three reads back to the curated row count."""
    import os

    from kinesis_logs_reader_spark.operators.pipeline import curate, write_splits_one_pass
    from kinesis_logs_reader_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "splits")
    write_splits_one_pass(docs, out)
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val", "split=test"}
    back = spark.read.parquet(out)
    assert back.count() == curate(docs).count()
