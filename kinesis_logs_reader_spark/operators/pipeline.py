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


def curate(docs: DataFrame) -> DataFrame:
    """The curation DAG over a (doc_id, text, lang) frame; returns one
    row per surviving document with split/quality columns attached."""
    nt = n_tokens().cast("double")
    stop = stopword_count().cast("double")
    quality = F.round(F.log(F.lit(1) + nt) * (F.lit(1) - stop / nt), 4).cast(
        "double"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2_147_483_647
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # unhex: 16-byte binary digest key instead of the 32-char hex string
    # — half the shuffle-key bytes and cheaper hash/compare in the agg
    staged = docs.select(
        "doc_id",
        "lang",
        F.unhex(F.md5(normalize_text(F.col("text")))).alias("_h"),
        quality.alias("quality"),
        split.alias("split"),
    )
    # dedup: keep the smallest doc_id per canonical-text hash. min_by
    # aggregation, not a window: it partially aggregates map-side
    # (duplicates collapse before the exchange) and the reducer does a
    # hash-agg instead of a full sort of every partition — the probe
    # measured the window variant going superlinear at sf~1. ONE
    # struct-valued min (lexicographic on the leading doc_id) instead
    # of min + 3x min_by: one aggregate buffer, one comparison per row
    # (r5 A/B: A 0.526s / struct-min 0.509s / +unhex 0.484s at sf0.1).
    return (
        staged.groupBy("_h")
        .agg(F.min(F.struct("doc_id", "lang", "quality", "split")).alias("s"))
        .select("s.doc_id", "s.lang", "s.quality", "s.split")
        .filter(F.col("quality") > 0.5)
    )


def q90_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation report: surviving docs and exact average quality per
    (split, lang). Quality averages go through integer micro-units
    (floor(q*10^4)) so the sum is order-independent and bit-identical
    across engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    kept = curate(docs)
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
