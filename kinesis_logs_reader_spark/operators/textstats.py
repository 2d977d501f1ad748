"""Text analysis operators (SURVEY.md §2.2 I3/I5; LLM-pipeline extension).

Token counting, quality scoring, language/group stats, and document
fingerprinting over the ``documents`` table. All pure Catalyst
expressions (split / filter / array_distinct / md5) — per-row work that
whole-stage codegen pipelines, followed by at most one map-side
combinable aggregation. At 100 TB this is embarrassingly parallel scan
work with no shuffle except the final small group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.functions.text import n_tokens, shingles, stopword_count, tokens
from kinesis_logs_reader_spark.sources.tables import load_table


def q41_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up per language (I3)."""
    docs = load_table(spark, sf_dir, "documents")
    nt = n_tokens()
    return (
        docs.select("lang", nt.alias("nt"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.round(F.sum("nt").cast("double") / F.count(F.lit(1)), 4)
            .cast("double")
            .alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def q42_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, token stats, stopword and
    distinct-token ratios, and a composite score (I5/text-quality).

    Only docs in a fixed id slice are emitted to keep the oracle output
    bounded at any scale factor.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    nt = n_tokens().cast("double")
    nospace = F.length(F.regexp_replace("text", " ", ""))
    stop = stopword_count().cast("double")
    dist = F.size(F.array_distinct(tokens())).cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tokens().alias("nt"),
            F.length("text").alias("len_chars"),
            F.round(nospace / nt, 4).cast("double").alias("avg_token_len"),
            F.round(stop / nt, 4).cast("double").alias("stopword_ratio"),
            F.round(dist / nt, 4).cast("double").alias("distinct_ratio"),
            F.round(F.log(F.lit(1) + nt) * (F.lit(1) - stop / nt), 4)
            .cast("double")
            .alias("quality"),
        )
        .orderBy("doc_id")
    )


def q45_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact md5 + min-shingle-hash (winnowing
    lite). Both are per-row expressions; the min-shingle fingerprint is
    robust to rotation of surrounding text, the md5 to nothing.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles()
    return (
        docs.select(
            "doc_id",
            F.md5("text").alias("exact_fp"),
            F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("shingle_fp"),
        )
        .orderBy("doc_id")
    )


def q49_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing, SQL-checkable core: treat payloads as
    opaque binary + typed metadata (byte length, content hash).

    The decode/feature-extract path for real image/audio payloads lives
    in :mod:`kinesis_logs_reader_spark.operators.multimodal` (mapInPandas
    plumbing with a stubbed codec); here the text column stands in as
    the binary payload so the metadata path is oracle-checkable.
    """
    docs = load_table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return (
        docs.select(
            "doc_id",
            "source",
            F.octet_length(blob).alias("n_bytes"),
            F.md5(blob).alias("content_hash"),
        )
        .orderBy("doc_id")
    )
