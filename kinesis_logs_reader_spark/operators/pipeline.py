"""End-to-end training-data curation pipeline (capstone composition).

A realistic multi-stage corpus-curation job — normalize -> dedup ->
quality-filter -> split -> report — expressed as ONE declarative plan,
proving the individual operators (preprocess.py, textstats.py) compose
without materialization boundaries. Catalyst fuses the per-row stages
(normalize, quality, split are all narrow) into a single codegen pass
over the scan; the only shuffles are the dedup window (keyed by a
16-byte digest) and the final tiny report aggregate.

At 100 TB this exact plan shape holds: stage 1-3 are map-only over the
corpus scan, the dedup exchange is the one data-sized shuffle, and the
report collapses before leaving the executors. Nothing is collected,
re-read, or driver-looped between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.functions.text import (
    n_tokens,
    stopword_count,
    tokens,
)
from kinesis_logs_reader_spark.operators.preprocess import normalize_text
from kinesis_logs_reader_spark.sources.tables import load_table


def _quality_expr(nt_col, stop_col) -> F.Column:
    """The shared quality formula from exact int ingredients: casting
    the stored counts to double reproduces the from-raw-text doubles
    bit-for-bit (same operand values, same op order)."""
    nt = nt_col.cast("double")
    stop = stop_col.cast("double")
    return F.round(F.log(F.lit(1) + nt) * (F.lit(1) - stop / nt), 4).cast(
        "double"
    )


def _split_expr() -> F.Column:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2_147_483_647
        % 100
    )
    return (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _curate_staged(staged: DataFrame) -> DataFrame:
    """dedup + quality gate over a staged (doc_id, lang, _h, quality,
    split) frame.

    dedup: keep the smallest doc_id per canonical-text hash. min_by
    aggregation, not a window: it partially aggregates map-side
    (duplicates collapse before the exchange) and the reducer does a
    hash-agg instead of a full sort of every partition — the probe
    measured the window variant going superlinear at sf~1. ONE
    struct-valued min (lexicographic on the leading doc_id) instead
    of min + 3x min_by: one aggregate buffer, one comparison per row
    (r5 A/B: A 0.526s / struct-min 0.509s / +unhex 0.484s at sf0.1).
    """
    return (
        staged.groupBy("_h")
        .agg(F.min(F.struct("doc_id", "lang", "quality", "split")).alias("s"))
        .select("s.doc_id", "s.lang", "s.quality", "s.split")
        .filter(F.col("quality") > 0.5)
    )


def curate(docs: DataFrame) -> DataFrame:
    """The curation DAG over a (doc_id, text, lang) frame; returns one
    row per surviving document with split/quality columns attached.

    Generic (any docs frame). q90 uses the digest-cache-backed twin
    below; this form stays for curate_with_metrics/write_splits and
    arbitrary input frames.
    """
    # unhex: 16-byte binary digest key instead of the 32-char hex string
    # — half the shuffle-key bytes and cheaper hash/compare in the agg
    staged = docs.select(
        "doc_id",
        "lang",
        F.unhex(F.md5(normalize_text(F.col("text")))).alias("_h"),
        _quality_expr(n_tokens(), stopword_count()).alias("quality"),
        _split_expr().alias("split"),
    )
    return _curate_staged(staged)


def q90_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation report: surviving docs and exact average quality per
    (split, lang). Quality averages go through integer micro-units
    (floor(q*10^4)) so the sum is order-independent and bit-identical
    across engines.

    r10: staged from the shared cached_canonical_digests frame
    (VERDICT r9 item 8) — the digest, token count, and stopword count
    all come from the one persisted corpus pass; quality rebuilt from
    the exact int ingredients is bit-identical to the from-text form
    (same operand values and op order), and the oracle still
    recomputes everything from raw text.
    """
    from kinesis_logs_reader_spark.operators.preprocess import (
        cached_canonical_digests,
    )

    dig = cached_canonical_digests(spark, sf_dir)
    staged = dig.select(
        "doc_id",
        "lang",
        F.unhex(F.col("h")).alias("_h"),
        _quality_expr(F.col("nt"), F.col("n_stop")).alias("quality"),
        _split_expr().alias("split"),
    )
    kept = _curate_staged(staged)
    qmicro = F.floor(F.col("quality") * 10_000).cast("bigint")
    return (
        kept.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(qmicro) / (F.count(F.lit(1)) * F.lit(10_000.0)), 4
            )
            .cast("double")
            .alias("avg_quality"),
        )
        .orderBy("split", "lang")
    )


def curate_with_metrics(docs: DataFrame):
    """The curation DAG instrumented with Spark's Observation API:
    in-flight row counts and quality stats collected DURING the one
    pass — no second scan, no .count() re-execution. This is how a
    production 100 TB run reports admission rates without paying for a
    metrics job: observe() hooks accumulate inside the same codegen
    stages. Returns (curated_df, observation); metrics are available
    after the df is consumed once.
    """
    from pyspark.sql import Observation

    obs = Observation("curation")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.length("text").cast("bigint")).alias("total_chars"),
    )
    return curate(observed), obs


def write_splits_one_pass(docs: DataFrame, out_dir: str) -> None:
    """Materialize train/val/test as separate directories in ONE scan:
    partitionBy on the split column fans a single pass out to all
    three outputs — vs the naive three filtered writes that re-scan
    the corpus three times (3x I/O at 100 TB).
    """
    curate(docs).write.mode("overwrite").partitionBy("split").parquet(out_dir)
