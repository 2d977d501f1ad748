"""Corpus-curation operators: quality rules, repetition, mixture
sampling, sequence packing, ranking, sampling, auditing (LLM-pipeline
extension beyond SURVEY.md §2.2 I1-I6).

These are the batch ops a training-data pipeline runs between raw
ingest and tokenization: Gopher-style quality-rule filtering,
repetition detection, domain-mixture sampling, context-window packing,
TF-IDF / BM25 relevance scoring, stratified sampling, data-quality
audits, and embedding-outlier detection. Everything is declarative
DataFrame code (no Python UDFs): per-document signals are per-row
array/string expressions that whole-stage codegen pipelines over the
scan; corpus-level statistics (document frequency, centroids, strata
sizes) are map-side-combinable aggregates broadcast back to the big
side, so at 100 TB each query is one corpus scan + tiny-side joins.

Determinism/oracle notes: hash decisions use md5 (bit-identical across
engines, like operators/preprocess.py); cross-row float aggregation is
avoided by quantizing embedding coordinates to integers (exact int64
arithmetic in both Spark and DuckDB) before summing — float SUM order
across partitions is otherwise nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_logs_reader_spark.functions.generate import (
    explode_nonempty,
    posexplode_nonempty,
)
from kinesis_logs_reader_spark.functions.text import n_tokens, shingles, stopword_count, tokens
from kinesis_logs_reader_spark.sources.tables import load_table, spread_scan
from kinesis_logs_reader_spark.functions.caching import corpus_key


def _md5_bucket(col: Column, mod: int = 100) -> Column:
    """Deterministic [0, mod) bucket from md5 (same trick as q77)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
        % 2_147_483_647
        % mod
    )


def gopher_frame(docs: DataFrame) -> DataFrame:
    """Per-document quality-rule columns over any (doc_id, text) frame.

    Pure per-row expressions with no aggregation or sort, so the exact
    same function runs on a batch DataFrame and on a streaming one
    (``streaming/jobs.py::h12_quality_filter``) — curation rules apply
    to a live ingest feed with zero re-implementation.
    """
    nt = n_tokens().cast("double")
    awl = F.length(F.regexp_replace("text", " ", "")) / nt
    nstop = stopword_count()
    dist_ratio = F.size(F.array_distinct(tokens())).cast("double") / nt
    staged = docs.select(
        "doc_id",
        nt.cast("int").alias("nt"),
        F.round(awl, 4).cast("double").alias("avg_word_len"),
        nstop.cast("int").alias("n_stopwords"),
        F.round(dist_ratio, 4).cast("double").alias("distinct_ratio"),
        (nt >= 10).alias("rule_min_words"),
        (nt <= 120).alias("rule_max_words"),
        ((awl >= 3.0) & (awl <= 10.0)).alias("rule_word_len"),
        (nstop >= 2).alias("rule_stopwords"),
        (dist_ratio > 0.2).alias("rule_distinct"),
    )
    passes = (
        F.col("rule_min_words")
        & F.col("rule_max_words")
        & F.col("rule_word_len")
        & F.col("rule_stopwords")
        & F.col("rule_distinct")
    )
    return staged.withColumn("passes", passes)


def q91_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule filter (Rae et al. 2021 §A1.1 shape).

    Per-document boolean rules — word-count bounds, mean-word-length
    bounds, minimum stopword evidence, distinct-token ratio — plus the
    conjunction. All per-row expressions: at 100 TB this is a map-only
    pass fused into the scan, the canonical first stage of corpus
    curation. Fixed doc slice keeps oracle output bounded.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return gopher_frame(docs).orderBy("doc_id")


def q92_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection: most-frequent-token fraction and duplicate
    bigram fraction (the Gopher repetition signals for one-line docs).

    Bigram dedup ratio is a pure per-row array expression; the
    top-token count is explode -> two-level aggregate where the first
    level (doc_id, token) partially aggregates map-side, so the one
    shuffle moves (doc, distinct-token) pairs, not token instances.
    """
    # spread_scan (r14): the tokenize/bigram chain and the token
    # explode below both ran on the scan's single task (guide §2.5)
    docs = spread_scan(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    )
    # tokens, then bigrams, materialized stage by stage: the inline
    # shingles(text) form re-splits the text per bigram element (see
    # functions/text.py) and this expression uses the array twice
    from kinesis_logs_reader_spark.functions.text import shingles_from_tokens, tokens

    bigd = docs.select(
        "doc_id",
        F.size(tokens()).alias("nt"),
        shingles_from_tokens(tokens(), k=2).alias("_big"),
    )
    per_row = bigd.select(
        "doc_id",
        "nt",
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("_big")).cast("double")
            / F.greatest(F.size("_big"), F.lit(1)).cast("double"),
            4,
        )
        .cast("double")
        .alias("dup_bigram_frac"),
    )
    tok_counts = (
        docs.select("doc_id", F.explode(tokens()).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_cnt"))
    )
    joined = per_row.join(tok_counts, "doc_id")
    top_frac = F.round(
        F.col("top_tok_cnt").cast("double") / F.col("nt").cast("double"), 4
    ).cast("double")
    return (
        joined.select(
            "doc_id",
            "nt",
            "top_tok_cnt",
            top_frac.alias("top_token_frac"),
            "dup_bigram_frac",
            ((top_frac > 0.2) | (F.col("dup_bigram_frac") > 0.3)).alias("flagged"),
        )
        .orderBy("doc_id")
    )


def q93_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: down-sample each source to a target
    rate (the train-mix reweighting step) with a deterministic
    md5-coin per row — never rand(), so the sample is reproducible
    and repartition-stable. Map-only over the scan; the report
    aggregate is tiny.
    """
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", "([0-9]+)", 1).cast("int")
    rate = (
        F.when(src_num < 5, F.lit(100))
        .when(src_num < 10, F.lit(50))
        .otherwise(F.lit(25))
    )
    coin = _md5_bucket(F.concat_ws(":", "source", F.col("doc_id").cast("string")))
    staged = docs.select(
        "source", rate.alias("rate_pct"), (coin < rate).cast("int").alias("kept")
    )
    # eff_rate as integer parts-per-million (exact int64 division, the
    # scaled-int idiom): the r2-era round(sum/count, 4) double was
    # driver-hash-red in r4 despite local parity — encoding knife edge.
    return (
        staged.groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .select(
            "source",
            "rate_pct",
            "n_total",
            "n_kept",
            F.expr("(n_kept * CAST(1000000 AS BIGINT)) div n_total")
            .cast("bigint")
            .alias("eff_rate_ppm"),
        )
        .orderBy("source")
    )


def q94_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents (ordered by doc_id
    within language) to fixed-capacity token bins via the offset rule
    bin = floor((running_tokens - nt) / capacity) — the streaming-
    friendly approximation of greedy packing that is expressible as
    one window cumulative sum (single shuffle, no iteration).

    Per (lang, bin): docs packed, tokens used, fill ratio. At scale
    the window key (lang) is coarse; a production variant adds a
    salt/bucket column to the partitionBy to bound per-key state.
    """
    cap = 256
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        "lang", "doc_id", n_tokens().alias("nt")
    ).withColumn("cum", F.sum("nt").over(w))
    binned = staged.withColumn(
        "bin", F.floor((F.col("cum") - F.col("nt")) / F.lit(cap))
    )
    # fill_ratio as integer ppm: sum(nt)/256 is a multiple of 1/256, so
    # round(x, 4) lands on EXACT decimal half-way points whenever
    # sum(nt) % 8 == 4 (k*625/16 ≡ n+1/2 ⟺ k ≡ 4 mod 8) — a HALF_UP vs
    # HALF_EVEN knife edge across engines, the r4 driver-hash-red cause.
    # Integer (sum*1e6) div 256 is exact everywhere.
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("bin_tokens"),
        )
        .select(
            "lang",
            "bin",
            "n_docs",
            "bin_tokens",
            F.expr(f"(bin_tokens * CAST(1000000 AS BIGINT)) div {cap}")
            .cast("bigint")
            .alias("fill_ratio_ppm"),
        )
        .orderBy("lang", "bin")
    )


def q95_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (fixed doc slice).

    Document frequency and corpus size come from full-corpus
    aggregates; tf from an explode + count on the slice. The df side
    is vocabulary-sized (small) and broadcast into the tf join, so the
    corpus-sized data moves through exactly one (doc_id, term)
    aggregation. idf = ln(N / df), score rounded for the oracle hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    # N as a lazy 1-row broadcast (no eager .count() on the driver)
    n_tbl = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    # spread_scan A/B (r14): OFF wins 0.31 vs 0.33 s — the explode
    # feeds a combining (t) partial agg overlapping the scan.
    # Measured-negative.
    df_tbl = (
        docs
        .select(F.explode(F.array_distinct(tokens())).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_tbl))
    )
    tf_tbl = (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode(tokens()).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf_tbl.join(F.broadcast(df_tbl), "t").select(
        "doc_id",
        F.col("t").alias("term"),
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.col("n_corpus").cast("double") / F.col("df")), 4
        )
        .cast("double")
        .alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rn")
    )


def q96_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: precisely ceil(10%) of every lang
    stratum, rows chosen by md5 order (deterministic, uniform-ish,
    reproducible). row_number + per-stratum count = one window pass +
    one broadcast join; contrast with df.sampleBy which is only
    approximate and seed/partitioning-sensitive.

    Output is an audit aggregate (exact sample size + id checksum per
    stratum) so the hash check pins membership, not just counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_stratum"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = (
        docs.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(sizes), "lang")
        # integer ceil-division: ceil(n/10) == (n+9) div 10 for n >= 0.
        # The r2-era ceil(n_stratum * 0.1) double form sat on a knife
        # edge at exact multiples of 10 (double-vs-decimal literal
        # semantics differ across engines) — r4 driver-hash-red cause.
        .filter(F.col("rn") <= F.expr("(n_stratum + 9) div 10"))
    )
    return (
        ranked.groupBy("lang", "n_stratum")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.min("doc_id").alias("id_min"),
            F.max("doc_id").alias("id_max"),
        )
        .orderBy("lang")
    )


def q97_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: named constraint rules -> violation counts
    (null / range / cross-column / referential checks), the validation
    gate a pipeline runs before publishing a snapshot.

    Same-table rules FUSE into one conditional aggregate (one scan per
    table covers every null/range/cross-column rule on it — the seven
    independent filter-count jobs this replaces each paid a full scan
    plus the job floor); referential rules stay anti-joins. Each fused
    row unpivots to (rule, n_violations) after aggregation, so the
    output contract is unchanged.

    r10 weak-row pass (growth 3.0 at sf~1): the anti-joins now (a)
    project BOTH sides to the key column before the exchange — an
    orphan check needs nothing else, and the old plan shuffled whole
    lineitem rows — and (b) carry SHUFFLE_HASH hints (the q05 finding:
    SMJ sorts both shuffled sides for a one-shot existence probe).
    sf~1 interleaved A/B: 1.11/1.19 s → **0.73/0.80 s (−35%)**, all 7
    rule rows identical. Key-only projection + SHJ is also the 100 TB
    posture: the anti-join's build side is 8-byte keys per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def cnt(cond) -> F.Column:
        return F.sum(cond.cast("bigint"))

    def unpivot(agg_df: DataFrame, names: list[str]) -> DataFrame:
        return agg_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.col(f"_{i}").alias("n_violations"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("r")
        ).select("r.rule", "r.n_violations")

    li_rules = unpivot(
        li.agg(
            cnt(
                (F.col("l_shipdate") < F.lit("1992-01-01"))
                | (F.col("l_shipdate") > F.lit("1998-12-31"))
            ).alias("_0"),
            cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)).alias("_1"),
            cnt(F.col("l_quantity") <= 0).alias("_2"),
        ),
        ["lineitem.shipdate_range", "lineitem.discount_range", "lineitem.qty_positive"],
    )
    orders_rules = unpivot(
        orders.agg(
            cnt(F.col("o_custkey").isNull()).alias("_0"),
            cnt(F.col("o_totalprice") <= 0).alias("_1"),
        ),
        ["orders.null_custkey", "orders.totalprice_positive"],
    )

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )

    checks = [
        li_rules,
        rule(
            "lineitem.orphan_orderkey",
            li.select("l_orderkey").join(
                orders.select("o_orderkey").hint("SHUFFLE_HASH"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        orders_rules,
        rule(
            "orders.orphan_custkey",
            orders.select("o_custkey").join(
                cust.select("c_custkey").hint("SHUFFLE_HASH"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("rule")


def bm25_scored(
    docs: DataFrame, terms: tuple[str, ...], k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25 scores (unrounded double ``bm25_raw``, ``n_terms_hit``) for
    every document hitting at least one query term.

    Corpus-level stats (df per query term, avg doc length, N) are tiny
    and broadcast; per-doc tf comes from one filtered explode-aggregate.
    Shared by q98 (ranking) and q110 (hybrid RRF fusion).
    """
    # corpus stats as a lazy 1-row broadcast: exact N, integer-exact
    # avgdl numerator (sum of token counts) so both engines divide the
    # same two integers instead of averaging floats in partition order
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.sum(n_tokens()).alias("sum_dl"),
    )
    tf_tbl = (
        docs.select("doc_id", n_tokens().alias("dl"), F.explode(tokens()).alias("t"))
        .filter(F.col("t").isin(*terms))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df(t) = number of documents containing t — derivable from the tf
    # table (one row per (doc, term)) instead of a second corpus-wide
    # explode + array_distinct pass: same value, one scan saved.
    df_tbl = (
        tf_tbl.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_corpus").cast("double")
    idf = F.log(
        (F.col("n_corpus").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    tfn = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    return (
        tf_tbl.join(F.broadcast(df_tbl), "t")
        .groupBy("doc_id")
        .agg(
            F.sum(idf * tfn).alias("bm25_raw"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )


def cached_bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted BM25-scored frame for the fixed demo query terms,
    shared by q98 (ranking) and q110 (hybrid fusion) — corpus search
    and fusion reuse one index exactly as a production retriever
    would. Rows = docs hitting >= 1 term (query-bounded, small)."""
    cache = spark.__dict__.setdefault("_klrs_bm25_cache", {})
    ck = corpus_key(sf_dir, "documents")
    if ck not in cache:
        docs = load_table(spark, sf_dir, "documents")
        cache[ck] = bm25_scored(docs, ("table", "spark", "key")).persist()
    return cache[ck]


def q98_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking of documents for a fixed term query —
    the retrieval scorer for corpus search / dedup triage.

    One corpus scan + broadcast stats (see :func:`bm25_scored`);
    top-20 via TakeOrderedAndProject.
    """
    scored = cached_bm25_scored(spark, sf_dir).select(
        "doc_id",
        F.round("bm25_raw", 4).cast("double").alias("bm25"),
        "n_terms_hit",
    )
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(20)
    return top.orderBy("doc_id")


def q99_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection: distance to the label centroid,
    top-3 farthest vectors per label (mislabeled/noisy-sample triage).

    Exactness across engines: coordinates are quantized to integers
    (floor(v*1024+0.5)) so the centroid sums are exact int64 and the
    scaled distance sum((q*n - sum_q)^2) is exact integer math — no
    float-summation-order nondeterminism. The scale is 1024, not 1000
    (r5 hardening): a power-of-two multiply of a float32-derived value
    is EXACT in both float and double arithmetic, and v*1024 + 0.5
    still fits a 24-bit mantissa for |v| < 16, so the quantizer gives
    bit-identical integers regardless of whether an engine evaluates
    the expression in FLOAT or DOUBLE — the r4 v*1000 form left a
    rounding knife edge that was driver-hash-red while locally green.
    One posexplode + one (label, dim) aggregate (map-side combinable,
    64*labels rows) + broadcast join back; the corpus moves through a
    single shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("v").cast("double") * 1024 + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    cent = flat.groupBy("label", "dim").agg(
        F.sum("q").alias("sum_q"), F.count(F.lit(1)).alias("n")
    )
    dist = (
        flat.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("q") * F.col("n") - F.col("sum_q"))
                * (F.col("q") * F.col("n") - F.col("sum_q"))
            ).alias("dist2_scaled")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("dist2_scaled").desc(), "vec_id")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "rn", "vec_id", "dist2_scaled")
        .orderBy("label", "rn")
    )


def q102_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive length filtering: per-language p5/p95 token-count
    cutoffs computed from the corpus itself, then applied — the
    data-driven variant of q91's fixed word-count bounds (what real
    curation does when languages have different length profiles).

    Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``) per language: a langs-sized table broadcast back
    over the corpus, so the plan is one aggregate + one map-side join +
    one tiny report aggregate. At 100 TB the exact percentile would be
    swapped for ``approx_percentile`` at equal plan shape.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", n_tokens().alias("nt")
    )
    cuts = docs.groupBy("lang").agg(
        F.expr("percentile(nt, 0.05)").alias("p05"),
        F.expr("percentile(nt, 0.95)").alias("p95"),
    )
    flagged = docs.join(F.broadcast(cuts), "lang").select(
        "lang",
        "p05",
        "p95",
        (F.col("nt") < F.col("p05")).cast("int").alias("below"),
        (F.col("nt") > F.col("p95")).cast("int").alias("above"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.round(F.first("p05"), 4).cast("double").alias("p05"),
            F.round(F.first("p95"), 4).cast("double").alias("p95"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("below").alias("n_below"),
            F.sum("above").alias("n_above"),
            F.round(
                (F.count(F.lit(1)) - F.sum("below") - F.sum("above"))
                / F.count(F.lit(1)).cast("double"),
                4,
            )
            .cast("double")
            .alias("kept_ratio"),
        )
        .orderBy("lang")
    )


def q105_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve: the top-30 corpus tokens with the
    cumulative fraction of all token occurrences a vocabulary truncated
    at each rank would cover — the sizing curve a tokenizer build
    reads before fixing its vocab.

    One explode -> (token) count (map-side combinable), then ranking
    and a running sum over the vocabulary-sized result — the window
    runs on thousands of rows regardless of corpus size, so at 100 TB
    all real work is in the first aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens()).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("total"))
    w_rank = Window.orderBy(F.col("c").desc(), F.col("t"))
    w_cum = Window.orderBy(F.col("c").desc(), F.col("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("cum_c", F.sum("c").over(w_cum))
        .filter(F.col("rank") <= 30)
        .select(
            "rank",
            F.col("t").alias("token"),
            "c",
            F.round(F.col("cum_c") / F.col("total").cast("double"), 6)
            .cast("double")
            .alias("cum_coverage"),
        )
        .orderBy("rank")
    )


def q110_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    2009): fuse a lexical BM25 ranking and an embedding-cosine ranking
    of the same corpus into one list via rrf = sum(1 / (60 + rank)).

    The fusion needs only the two rank lists, never the raw scores, so
    at scale each retriever emits its own top-k (TakeOrdered over
    candidates) and the fusion is a join of two k-row frames. Here the
    ranks are exact over the full corpus so the oracle can reproduce
    them: ranks come from the ROUNDED scores (bm25 @4, cosine @4) with
    doc_id tie-breaks, which makes the rank integers — and therefore
    the rrf doubles — bit-identical across engines.

    Late-r13 note: audit_plans.py scan 3 flags this query's global
    windows (whitelisted there with this rationale). A rank-kernel
    rewrite (operators/rank.py) was built, measured, and REVERTED:
    bit-identical ranks, but 3-4x slower at every measured SF (the
    ranked frames are (doc_id, score) pairs — 4.8k-50k rows — where
    one-thread sorts are instant and the kernel's extra stages are
    pure floor). q110 exists as the exact full-corpus-rank twin;
    q110b is the declared production path (per-retriever TakeOrdered
    top-K, never a global rank), and rank.py is the kernel to reach
    for when an exact corpus-scale global rank is genuinely required
    (q21, q206).
    """
    from kinesis_logs_reader_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    scored = cached_bm25_scored(spark, sf_dir).select(
        "doc_id", F.round("bm25_raw", 4).alias("bm25")
    )
    w_bm = Window.orderBy(F.col("bm25").desc(), "doc_id")
    bm_rank = scored.select(
        "doc_id", F.row_number().over(w_bm).alias("rank_bm25")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    sims = emb.join(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("sim"),
    )
    w_cos = Window.orderBy(F.col("sim").desc(), "doc_id")
    cos_rank = sims.select(
        "doc_id", F.row_number().over(w_cos).alias("rank_cos")
    )
    fused = (
        cos_rank.join(F.broadcast(bm_rank), "doc_id", "left")
        .select(
            "doc_id",
            "rank_cos",
            "rank_bm25",
            F.round(
                F.lit(1.0) / (60 + F.col("rank_cos"))
                + F.coalesce(
                    F.lit(1.0) / (60 + F.col("rank_bm25")), F.lit(0.0)
                ),
                6,
            ).cast("double").alias("rrf"),
        )
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)
    return top.orderBy("doc_id")


def q110b_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production entry point for RRF hybrid retrieval (VERDICT r4 #3):
    each retriever emits its own top-K via TakeOrderedAndProject, and
    the fusion is a FULL OUTER join of two K-row frames — the
    100 TB-safe shape. q110 keeps the exact full-corpus-rank form as
    the oracle twin (the q37/q37b pattern).

    The difference that matters at scale: q110 ranks the whole corpus
    through a global no-partitionBy window (one partition holds every
    row); here the corpus-sized work is a map-only score pass feeding
    a per-partition top-K heap + driver merge (TakeOrdered), and only
    the two K-row lists are ever globally ordered. Semantics are the
    standard top-K RRF: a document contributes 1/(60+rank) per list it
    appears in (rank taken inside that list's top-K), so ranks <= K
    agree exactly with q110's global ranks and the operator is still
    deterministic and oracle-checkable.
    """
    from kinesis_logs_reader_spark.operators.similarity import cosine

    k_list = 60
    emb = load_table(spark, sf_dir, "embeddings")
    scored = cached_bm25_scored(spark, sf_dir).select(
        "doc_id", F.round("bm25_raw", 4).alias("bm25")
    )
    # TakeOrderedAndProject: per-partition heap, no global sort shuffle
    bm_top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k_list)
    w_bm = Window.orderBy(F.col("bm25").desc(), "doc_id")
    bm_rank = bm_top.select(
        "doc_id", F.row_number().over(w_bm).alias("rank_bm25")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    sims = emb.join(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("sim"),
    )
    cos_top = sims.orderBy(F.col("sim").desc(), "doc_id").limit(k_list)
    w_cos = Window.orderBy(F.col("sim").desc(), "doc_id")
    cos_rank = cos_top.select(
        "doc_id", F.row_number().over(w_cos).alias("rank_cos")
    )
    # full outer: a doc may sit in one list's top-K only (K rows/side).
    # rrf is emitted in integer micro-units (1000000 DIV (60+rank)) —
    # the scaled-int64 idiom adopted after the r4 driver-hash reds — so
    # the hashed output column is pure integer arithmetic in both
    # engines, never a float encoding knife-edge.
    fused = cos_rank.join(bm_rank, "doc_id", "full").select(
        "doc_id",
        "rank_cos",
        "rank_bm25",
        (
            F.coalesce(F.expr("1000000 DIV (60 + rank_cos)"), F.lit(0))
            + F.coalesce(F.expr("1000000 DIV (60 + rank_bm25)"), F.lit(0))
        ).cast("bigint").alias("rrf_ppm"),
    )
    top = fused.orderBy(F.col("rrf_ppm").desc(), "doc_id").limit(20)
    return top.orderBy("doc_id")


def q113_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-blocklist + flagged-term filtering — the "remove these
    domains and spammy pages" pass of a crawl-curation pipeline.

    The blocklist is a real (tiny) DataFrame joined with an explicit
    broadcast — the pattern that scales to a million-entry blocklist —
    not an ``isin`` literal. Flagged-term counting is a per-row
    ``filter`` lambda over the token array (JVM codegen, no explode).
    Map-only over the corpus scan + one tiny aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    block = spark.createDataFrame(
        [("src3",), ("src7",), ("src13",)], "source string"
    ).withColumn("blocked", F.lit(True))
    flagged = F.size(
        F.filter(tokens(), lambda t: (t == "slow") | (t == "big"))
    )
    staged = (
        docs.join(F.broadcast(block), "source", "left")
        .select(
            "source",
            F.coalesce("blocked", F.lit(False)).alias("is_blocked"),
            flagged.alias("n_flagged"),
        )
        .withColumn(
            "kept", (~F.col("is_blocked")) & (F.col("n_flagged") <= 4)
        )
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_blocked").cast("int")).alias("n_blocked"),
            F.sum((F.col("n_flagged") > 4).cast("int")).alias("n_overflagged"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
        )
        .orderBy("source")
    )


def q114_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain-mixture weights (the multilingual /
    multi-source sampling rule of mBERT/XLM-R and data-mix papers):
    w_i = n_i^alpha / sum_j n_j^alpha at alpha = 0.7 — upsamples the
    tail sources relative to their natural frequency.

    Exactness across engines: n^0.7 is quantized to int64
    (floor(pow * 1e6 + 0.5)) BEFORE the denominator sum, so the
    normalizing total is exact integer arithmetic and the final
    weight is one deterministic double division — no float-sum-order
    nondeterminism. One tiny aggregate (|sources| rows) + a 1-row
    broadcast total back over it.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    keyed = counts.withColumn(
        "k",
        F.floor(F.pow(F.col("n_docs").cast("double"), 0.7) * 1e6 + 0.5).cast(
            "bigint"
        ),
    )
    total = keyed.agg(F.sum("k").alias("tot"))
    return (
        keyed.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "k",
            F.round(F.col("k").cast("double") / F.col("tot"), 6)
            .cast("double")
            .alias("weight"),
            F.floor(F.col("k") * 100000 / F.col("tot")).cast("bigint")
            .alias("per_100k"),
        )
        .orderBy("source")
    )


def q117_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diagnostic: OLS fit of the Zipf slope over the top-100
    token ranks — ln(freq) ~ slope * ln(rank) + intercept. A healthy
    natural-language corpus sits near slope -1; a synthetic or
    template-heavy corpus is much flatter. The tokenizer/mixture teams
    read this before trusting a new crawl.

    One corpus explode -> token counts (map-side combinable, vocab-
    bounded), then the regression runs over <= 100 rows: rank window,
    ln() quantized to int64 micro-units, integer moment sums (exact in
    both engines; the OLS slope is scale-invariant so the 1e6
    quantization cancels), one final double division.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens()).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.orderBy(F.col("c").desc(), F.col("t"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 100)
        .select(
            F.floor(F.log(F.col("rank").cast("double")) * 1e6)
            .cast("bigint")
            .alias("xq"),
            F.floor(F.log(F.col("c").cast("double")) * 1e6)
            .cast("bigint")
            .alias("yq"),
        )
    )
    moments = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / 1e6
    )
    return moments.select(
        "n",
        F.round(slope, 4).cast("double").alias("zipf_slope"),
        F.round(intercept, 4).cast("double").alias("zipf_intercept"),
    )


def q120_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: corpus-wide adjacent-token-pair
    counts — the statistic the first BPE merge iteration maximizes
    (Sennrich et al. 2016). Emits the top-20 pairs with their proposed
    merged symbol.

    Pairs are per-row array shingles (k=2, no shuffle until the count);
    the one shuffle moves (pair, partial count) — map-side combinable,
    bounded by vocab^2, not corpus size. A full BPE trainer loops this
    query, applying the winning merge between iterations; each
    iteration is one scan + one tiny aggregate.
    """
    from kinesis_logs_reader_spark.functions.text import shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    # spread_scan (r14): parallelize the pair explode off the
    # single-task scan (guide §2.5)
    tokd = spread_scan(docs).select(tokens().alias("_toks"))
    # explode_nonempty: the inferred filter would re-inline the pair
    # lambda over _toks per element (functions/generate.py)
    pairs = explode_nonempty(
        tokd, shingles_from_tokens(F.col("_toks"), k=2), "pair"
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), "pair").limit(20)
    w = Window.orderBy(F.col("n").desc(), "pair")
    return top.select(
        F.row_number().over(w).alias("rank"),
        "pair",
        "n",
        F.regexp_replace("pair", " ", "").alias("merged"),
    ).orderBy("rank")


def q125_dsir_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" shape): score every
    corpus document by the log-likelihood ratio of its tokens under a
    TARGET-domain unigram model vs the general-corpus model, then keep
    the top scorers — the importance-sampling step that tilts a crawl
    toward a target domain. Target here: the lang='en' slice.

    Both models come out of ONE vocab-bounded conditional aggregate
    over the shared token frame (r11: the r5-r10 form aggregated the
    token stream twice — all-corpus and target slice — then joined the
    two vocab tables; ct as sum(lang='en') folds the target model into
    the general pass, deleting one token-stream shuffle and the vocab
    join — measured −15% at sf0.1 / −6% at sf~1, values identical;
    PERF.md r11), broadcast back over one corpus token pass.
    Exactness: each token's log-ratio is computed from exact integer
    counts and quantized to int64 micro-nats BEFORE the per-doc sum,
    so accumulation is exact integer math in both engines.
    """
    from kinesis_logs_reader_spark.operators.textstats import cached_doc_tokens

    tok = cached_doc_tokens(spark, sf_dir)
    counts = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("ca"),
        F.sum((F.col("lang") == "en").cast("bigint")).alias("ct"),
    )
    totals = counts.agg(
        F.sum("ca").alias("ta"),
        F.count(F.lit(1)).alias("v"),
        F.sum("ct").alias("tt"),
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "t",
        F.floor(
            (
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("tt") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("ca") + 1).cast("double")
                    / (F.col("ta") + F.col("v")).cast("double")
                )
            )
            * 1e6
        ).cast("bigint").alias("lr_q"),
    )
    scored = (
        tok.join(F.broadcast(lr), "t")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("lr_q").alias("sum_lr_q"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tok",
            F.round(
                F.col("sum_lr_q").cast("double")
                / 1e6
                / F.col("n_tok").cast("double"),
                4,
            ).cast("double").alias("dsir_score"),
        )
    )
    top = scored.orderBy(F.col("dsir_score").desc(), "doc_id").limit(20)
    return top.orderBy("doc_id")


def q126_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing with a padding-waste audit: assign
    every document to its power-of-2 token-length bucket and report,
    per bucket, how many pad tokens a fixed-shape batch of that bucket
    wastes — the statistic that decides bucket boundaries for batched
    training/inference (pad-to-bucket vs pad-to-max).

    Map-only over the scan (bucket = 2^ceil(log2(nt)) is a per-row
    expression) + one tiny aggregate; at 100 TB the report is
    |buckets| rows. Exactness: bucket edges and pad counts are pure
    integer arithmetic; the waste ratio is one rounded division.
    """
    docs = load_table(spark, sf_dir, "documents")
    nt = n_tokens()
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log(2.0, nt.cast("double")))
    ).cast("bigint")
    staged = docs.select(
        nt.alias("nt"), F.greatest(bucket, F.lit(1)).alias("bucket")
    )
    return (
        staged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("real_tokens"),
            F.sum(F.col("bucket") - F.col("nt")).alias("pad_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "real_tokens",
            "pad_tokens",
            F.round(
                F.col("pad_tokens").cast("double")
                / (F.col("real_tokens") + F.col("pad_tokens")).cast("double"),
                4,
            ).cast("double").alias("waste_ratio"),
        )
        .orderBy("bucket")
    )


def q133_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-screen for eval contamination, with the exact
    answer audited beside it (complements the exact 3-gram overlap scan
    q89 and the span-level q130).

    At 100 TB you cannot afford an exact anti-join of every train doc
    against the eval set on every ingest batch; the production pattern
    is a tiny immutable Bloom filter of eval-doc digests broadcast to
    every executor, with the (rare) positives routed to the exact
    check. This query builds that filter in pure SQL — m = 8192 bits,
    k = 3 md5-derived bit positions per digest, the bit set being just
    the DISTINCT positions the eval side lights up — probes every train
    doc, and emits the per-source confusion: bloom flags vs exact
    digest membership. ``n_missed`` (exact hit the filter missed) is
    structurally zero — Bloom filters have no false negatives — so the
    column doubles as a cross-engine proof of the construction.

    Scale shape (r11 rewrite): the filter is MATERIALIZED as its
    production form — m/64 = 128 int64 words collected driver-side
    (bounded by construction: the distinct bit-position set is <= m =
    8192 ints, the same contract class as the q152b per-partition
    vector) and shipped as a 128-element literal array, so the train-
    side probe is three O(1) getbit tests riding the scan, MAP-ONLY
    until the per-source rollup. The r5-r10 form joined an exploded
    (doc_id, pos) stream against the bit set and grouped by doc_id —
    a train-sized shuffle plus a train-sized join-back that the
    docstring's own 100 TB pattern ("tiny immutable filter broadcast
    to every executor") says shouldn't exist; measured −13% at sf~1
    (0.99 -> 0.85 s) and two exchanges fewer (PERF.md r11). False-
    positive rate rises with eval-set saturation of the 8192 bits
    (1 - e^{-kn/m})^k — at sf0.01's ~14 eval docs it is ~0; the audit
    columns make the trade-off measurable rather than assumed.
    """
    m_bits, k_hashes = 8192, 3
    docs = load_table(spark, sf_dir, "documents")
    digested = docs.select("doc_id", "source", F.md5("text").alias("d"))
    eval_side = digested.filter(F.col("doc_id") % 37 == 0)
    train = digested.filter(F.col("doc_id") % 37 != 0)

    def positions(col):
        return [
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(k)), col)), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits
            for k in range(k_hashes)
        ]

    # bounded driver step: <= m = 8192 distinct ints by construction
    pos_rows = (
        eval_side.select(
            F.explode(F.array(*positions(F.col("d")))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 for the Spark literal
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    wcol = F.lit(words)

    def bit_test(pos):
        return (
            F.getbit(
                F.element_at(wcol, (pos / F.lit(64)).cast("int") + 1),
                (pos % 64).cast("int"),
            )
            == 1
        )

    tests = [bit_test(p) for p in positions(F.col("d"))]
    bloom_hit = tests[0] & tests[1] & tests[2]
    exact_set = eval_side.select("d").distinct().withColumn(
        "is_exact", F.lit(True)
    )
    per_doc = (
        train.withColumn("bloom_hit", bloom_hit)
        .join(F.broadcast(exact_set), "d", "left")
        .withColumn("exact_hit", F.coalesce(F.col("is_exact"), F.lit(False)))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom_flagged"),
            F.sum(F.col("exact_hit").cast("int")).alias("n_exact_dups"),
            F.sum((F.col("bloom_hit") & ~F.col("exact_hit")).cast("int")).alias(
                "n_false_pos"
            ),
            F.sum((F.col("exact_hit") & ~F.col("bloom_hit")).cast("int")).alias(
                "n_missed"
            ),
        )
        .orderBy("source")
    )


def q139_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining over adjacent token pairs — the statistic
    behind phrase-vocabulary induction (which multi-token units deserve
    their own tokenizer entries) and a complement to raw pair counts
    (q120): PMI ranks pairs that co-occur MORE than their unigram
    frequencies predict, not just often.

    PMI(a,b) = ln( P(ab) / (P(a) P(b)) ) = ln( c_ab * T_u^2 /
    (T_p * c_a * c_b) ), computed as ONE ln of an exact int64 rational
    quantized to micro-nats (q115/q125 idiom). The int64 products are
    safe through ~2e9 total tokens per partition-merged count; past
    that the cluster profile computes the same value as a sum/difference
    of per-factor lns.

    Scale shape: unigram and pair counts are two vocab-bounded
    map-side-combinable aggregates over one scan; the pair table joins
    the broadcast unigram table twice; top-k via TakeOrdered. Rare-pair
    noise is floored at c_ab >= 5 (PMI's classic failure mode).
    """
    from kinesis_logs_reader_spark.functions.text import shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    # spread_scan (r14): the tokenize+bigram explode feeds two
    # aggregates off the single-task scan (guide §2.5)
    tokd = spread_scan(docs).select(tokens().alias("_toks"))
    uni = (
        explode_nonempty(tokd, F.col("_toks"), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_uni = uni.agg(F.sum("c").alias("t_u"))
    pairs = (
        # explode_nonempty: see q120 (functions/generate.py)
        explode_nonempty(tokd, shingles_from_tokens(F.col("_toks"), k=2), "pair")
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
        .withColumn("a", F.split("pair", " ").getItem(0))
        .withColumn("b", F.split("pair", " ").getItem(1))
    )
    # r10: the pair TOTAL needs no second shingle-explode pass — every
    # doc contributes exactly max(0, n_tokens - 1) adjacent pairs, so
    # t_p is a map-only size() aggregate riding the scan. sf~1
    # interleaved A/B: 2.75/2.88 s (re-explode) → **1.58/1.63 s
    # (−43%)**, all 20 output rows identical.
    t_pair = tokd.select(
        F.sum(
            F.greatest(F.size("_toks") - 1, F.lit(0)).cast("bigint")
        ).alias("t_p")
    )
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    j = (
        pairs.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_pair))
    )
    num = F.col("c_ab") * F.col("t_u") * F.col("t_u")
    den = F.col("t_p") * F.col("c_a") * F.col("c_b")
    pmi_micro = F.floor(
        F.log(num.cast("double") / den.cast("double")) * 1e6
    ).cast("bigint")
    staged = j.select("pair", "c_ab", "c_a", "c_b", pmi_micro.alias("pmi_micro"))
    top = staged.orderBy(F.col("pmi_micro").desc(), "pair").limit(20)
    w = Window.orderBy(F.col("pmi_micro").desc(), "pair")
    return top.select(
        F.row_number().over(w).alias("rank"),
        "pair",
        "c_ab",
        "c_a",
        "c_b",
        "pmi_micro",
    ).orderBy("rank")


def q140_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
    the mixture-sampling primitive when documents carry quality or
    importance weights — each doc's inclusion probability is
    proportional to its weight, exactly, in ONE pass, no rejection
    loop. Per doc draw u in (0,1) and rank by u^(1/w); the top-k per
    stratum IS the weighted sample. Equivalent (and numerically safer):
    rank by ln(u)/w descending.

    Determinism: u comes from an md5 coin (the q93/q96 discipline —
    never rand(), stable under repartition), quantized to
    u = (h mod M + 1)/(M + 1); the sort key ln(u)/w is quantized to
    nano-units (int64) so both engines order identically. Weight =
    n_chars (the stand-in for a model quality score).

    Scale shape: map-only key computation riding the scan + one
    top-k-per-stratum window — identical cost to q96's uniform
    stratified sample; the weighting is free.
    """
    m_coin = 1_000_003
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("wsamp"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % m_coin
        + 1
    )
    u = h.cast("double") / float(m_coin + 1)
    key_nano = F.floor(F.log(u) / F.col("n_chars").cast("double") * 1e9).cast(
        "bigint"
    )
    staged = docs.select(
        "lang", "doc_id", F.col("n_chars").alias("w"), key_nano.alias("key_nano")
    )
    win = Window.partitionBy("lang").orderBy(
        F.col("key_nano").desc(), "doc_id"
    )
    return (
        staged.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 20)
        .select("lang", "rank", "doc_id", "w", "key_nano")
        .orderBy("lang", "rank")
    )


def q148_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate mining: collapse every digit run to '#' and
    normalize case/whitespace, then group documents whose SKELETONS
    collide — the mad-lib detector that catches machine-generated
    families ("Error 404 at 10:32", "Error 500 at 11:07") that exact
    and near-dup both miss (different digits -> different shingles, but
    one template).

    Variants are planted in-query (docs id < 15 re-emitted twice at
    id+4000000/+4100000 with different numeric suffixes) so template
    groups exist by construction and must surface with n_docs >= 3.
    Scale shape: skeleton digest is a map-only expression; one
    16-byte-keyed aggregate; output bounded to groups with >= 2 docs.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" error 42 at 1032")).alias("text"),
    )
    v2 = docs.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 4100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" error 500 at 911")).alias("text"),
    )
    base = docs.unionByName(v1).unionByName(v2)
    # r9 kernel: translate maps each digit to '#' (per-char lookup, no
    # regex), a single literal-run regex collapses '#'-runs — identical
    # to "[0-9]+" -> '#' whenever the raw text contains no literal '#'
    # (corpus is [a-z0-9 ]-only, plants add none). r10 (VERDICT r9
    # item 7): space runs collapse with ONE literal-run regex + trim on
    # the already-shrunken string instead of the split/filter/array_join
    # chain — A/B at sf0.1 (interleaved, warm): regex 0.346 s vs chain
    # 0.367 s, value-identical on all 23 groups. The chain allocates a
    # token array per row; the regex pass is a single scan over a
    # 3-symbol-class alphabet.
    skel_txt = F.regexp_replace(
        F.translate(F.lower(F.col("text")), "0123456789", "##########"),
        "#+",
        "#",
    )
    skeleton = F.md5(F.trim(F.regexp_replace(skel_txt, " +", " ")))
    return (
        base.select("doc_id", skeleton.alias("skel"))
        .groupBy("skel")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("exemplar_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("exemplar_id", "n_docs")
        .orderBy("exemplar_id")
    )


def q149_source_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive-term mining per source: Monroe-style log-odds of a
    term inside a source vs the rest of the corpus, add-1 smoothed —
    "which words characterize this source", the per-source complement
    of q95's per-document TF-IDF. A source whose signature terms are
    spam markers gets its mixture weight cut; this query produces that
    evidence.

    lift(t, s) = ln((c_st+1)/(T_s-c_st+1)) - ln((c_t-c_st+1)/(T-T_s-(c_t-c_st)+1))

    Exactness: every count is exact int64; the two lns are each one
    deterministic double op quantized to int64 micro-nats before the
    subtraction (q115 idiom), so ranking and values agree bit-for-bit
    across engines. Scale shape: all four aggregates are vocab- or
    |sources|-bounded after map-side combine; the final top-3 window
    runs over a |sources| x vocab frame, never corpus rows.
    """
    # spread_scan (r14): parallelize the tokenize+explode off the
    # single-task scan (guide §2.5)
    tok = spread_scan(load_table(spark, sf_dir, "documents")).select(
        "source", F.explode(tokens()).alias("t")
    )
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c_st"))
    t_tot = st.groupBy("t").agg(F.sum("c_st").alias("c_t"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    corpus = s_tot.agg(F.sum("t_s").alias("tt"))
    j = (
        st.join(F.broadcast(t_tot), "t")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(corpus))
    )
    lift_q = (
        F.floor(
            F.log(
                (F.col("c_st") + 1).cast("double")
                / (F.col("t_s") - F.col("c_st") + 1).cast("double")
            )
            * 1e6
        )
        - F.floor(
            F.log(
                (F.col("c_t") - F.col("c_st") + 1).cast("double")
                / (
                    F.col("tt") - F.col("t_s") - (F.col("c_t") - F.col("c_st")) + 1
                ).cast("double")
            )
            * 1e6
        )
    ).cast("bigint")
    w = Window.partitionBy("source").orderBy(
        F.col("lift_q").desc(), F.col("t")
    )
    return (
        j.select("source", "t", lift_q.alias("lift_q"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "source",
            F.col("rn").alias("rank"),
            F.col("t").alias("term"),
            F.round(F.col("lift_q").cast("double") / 1e6, 4)
            .cast("double")
            .alias("log_odds"),
        )
        .orderBy("source", "rank")
    )


def q156_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic proportional interleave — materialize the first 50
    positions of a TRAINING ORDER that feeds sources at their q114
    temperature weights. A data loader needs an actual sequence, not
    just target rates; the classic deterministic rule places the r-th
    item of source s at virtual time r / w_s, so heavier sources
    appear proportionally more often, with no RNG and full
    reproducibility across restarts (a property md5-coin sampling
    alone doesn't give: this is ORDER, not membership).

    Exactness: the virtual time is floor(r * 1e9 / w_q) with w_q =
    q114's int64-quantized n^0.7 weight — r*1e9 stays under 2^53 so
    the double division truncates identically in both engines; ties
    break on (source, doc_id). Scale shape: one |sources| aggregate
    broadcast back, one per-source row_number window (at 100 TB the
    window runs per source partition; the top-50 is TakeOrdered).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    keyed = counts.withColumn(
        "w_q",
        F.floor(F.pow(F.col("n_docs").cast("double"), 0.7) * 1e3 + 0.5).cast(
            "bigint"
        ),
    ).select("source", "w_q")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    staged = (
        docs.withColumn("r", F.row_number().over(w_src))
        .join(F.broadcast(keyed), "source")
        .withColumn(
            "vtime_q",
            F.floor(F.col("r").cast("double") * 1e9 / F.col("w_q")).cast(
                "bigint"
            ),
        )
    )
    top = (
        staged.orderBy("vtime_q", "source", "doc_id")
        .limit(50)
        .select("vtime_q", "source", "doc_id")
    )
    w_pos = Window.orderBy("vtime_q", "source", "doc_id")
    return (
        top.withColumn("position", F.row_number().over(w_pos))
        .select("position", "source", "doc_id")
        .orderBy("position")
    )


def q157_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch plan — the table every pretraining data plan
    starts from: given a total token budget, how many tokens each
    source contributes under the temperature mixture, and how many
    EPOCHS (repeats) of that source this implies. Sources whose
    epoch count is high are the ones the mixture will overfit /
    memorize first (cf. data-constrained scaling-law analyses), so
    the plan flags epochs > 4x.

    Budget is a fixed 1M tokens at any sf (the plan's shape, not its
    absolute size, is what the operator demonstrates). Exactness: all
    shares derive from int64-quantized n^0.7 weights and exact token
    counts; epochs are int64 micro-epochs. |sources|-bounded
    everywhere after one corpus aggregate.
    """
    budget = 1_000_000
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens().cast("bigint")).alias("tokens_avail"),
    )
    keyed = per_src.withColumn(
        "w_q",
        F.floor(
            F.pow(F.col("tokens_avail").cast("double"), 0.7) * 1e3 + 0.5
        ).cast("bigint"),
    )
    total = keyed.agg(F.sum("w_q").alias("tot_w"))
    return (
        keyed.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "tokens_avail",
            F.floor(F.lit(budget) * F.col("w_q") / F.col("tot_w"))
            .cast("bigint")
            .alias("tokens_wanted"),
        )
        .withColumn(
            "epochs_micro",
            F.floor(
                F.col("tokens_wanted").cast("double")
                * 1e6
                / F.col("tokens_avail").cast("double")
            ).cast("bigint"),
        )
        .withColumn("overfit_risk", F.col("epochs_micro") > 4_000_000)
        .orderBy("source")
    )


def q165_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (r7):
    for each query document, the top-5 lexically-closest corpus
    documents that are NOT near-duplicates of it.

    Training a retriever/embedder needs (query, positive, negatives)
    triples where the negatives are HARD — lexically similar enough
    to be informative — but not accidental positives. Both halves are
    existing kernels composed: the scorer is idf-weighted distinct
    3-token-SHINGLE overlap (the q46/q89 shingle-hash kernel — the
    corpus vocabulary is ~31 tokens, so unigram idf is degenerate
    while the shingle space discriminates; idf integer-scaled so the
    per-pair sum is exact int64 in both engines, no float-order
    hazard), and the accidental-positive filter is an ANTI-join
    against q46's MinHash candidate pairs. The planted corpus makes the semantics
    visible: each query doc_id < 20 has an exact copy at id+1000000
    that tops the lexical ranking but MUST be excluded (it is the
    positive, not a negative) — pinned in tests/test_llm_ops_r8.py.

    Scale shape: queries are a bounded set by contract (broadcast of
    (query, token, idf) rows); the corpus side is one distinct-token
    explode streaming through a broadcast hash join, partial-
    aggregated to one row per (query, candidate) before its only
    shuffle. The df-prune (tokens in > 10% of docs carry ~no idf
    signal and dominate fan-out) is the standard stopword lever that
    keeps the join linear in corpus size; per-query top-5 is a
    bounded-partition window (#queries partitions).

    Reference analog: none (beyond-reference mandate, SURVEY §2.2 I:
    training-pair construction).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    # spread_scan (r14): the md5+shingle explode chain below is
    # evaluated twice at full corpus width (df_tbl and scored) and was
    # pinned to the one-row-group scan's single task (guide §2.5);
    # the gated exchange parallelizes both evaluations and disappears
    # on a many-split table (sources/tables.py).
    corpus = spread_scan(docs.unionByName(planted))
    stats = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    from kinesis_logs_reader_spark.functions.text import (
        token_base_hashes,
        token_shingle_hashes,
    )

    base = corpus.select("doc_id", token_base_hashes().alias("tb"))
    # explode_nonempty: the inferred filter would re-inline the full
    # md5+shingle chain per element — the O(n^2) InferFiltersFromGenerate
    # trap (functions/generate.py, PERF.md r11)
    tok = explode_nonempty(
        base, token_shingle_hashes(F.col("tb")), "t", "doc_id"
    )
    idf_u = F.floor(
        F.log(F.col("n_corpus").cast("double") / F.col("df")) * 1e6 + F.lit(0.5)
    ).cast("long")
    df_tbl = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") * 10 <= F.col("n_corpus"))
        .select("t", idf_u.alias("idf_u"))
    )
    qtok = (
        tok.filter(F.col("doc_id") < 20)
        .select(F.col("doc_id").alias("query_id"), "t")
        .join(df_tbl, "t")
    )
    scored = (
        tok.join(F.broadcast(qtok), "t")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("idf_u").alias("s_u"))
    )
    pairs = _dup_pairs_both_ways(spark, sf_dir)
    negatives = scored.join(
        pairs,
        (scored.query_id == pairs.a) & (scored.doc_id == pairs.b),
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s_u").desc(), F.col("doc_id")
    )
    return (
        negatives.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "rank",
            F.col("doc_id").alias("neg_id"),
            F.round(F.col("s_u") / 1e6, 4).cast("double").alias("score"),
        )
        .orderBy("query_id", "rank")
    )


def _dup_pairs_both_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q46's candidate pairs, symmetrized to (a, b) for anti-joins."""
    from kinesis_logs_reader_spark.operators.dedup import (
        _cached_minhash_pairs,
    )

    p = _cached_minhash_pairs(spark, sf_dir)
    return p.select(F.col("ida").alias("a"), F.col("idb").alias("b")).unionByName(
        p.select(F.col("idb").alias("a"), F.col("ida").alias("b"))
    )


def q166_bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = 8) -> DataFrame:
    """Distributed BPE-merge training (r8): run ``n_merges`` full
    greedy merge iterations over the corpus token stream and emit the
    training trajectory — per step, the winning pair, its corpus
    count, and the stream length after applying it.

    q120 computes the statistic ONE merge iteration maximizes; this is
    the trainer that loops it (Sennrich et al. 2016 semantics, applied
    at token level over the document streams): each step (a) counts
    adjacent pairs corpus-wide, (b) picks the argmax (ties: count
    desc, then left/right lexicographic), (c) rewrites every stream
    greedily left-to-right non-overlapping — in a run of k identical
    overlapping matches (only possible when left==right) positions
    0,2,4... merge, exactly like the reference BPE implementations.

    Spark shape, per iteration: the pair count is a lead() window
    partitioned by doc_id (parallel across documents, no global sort)
    into a (left,right) groupBy — map-side-combinable and bounded by
    vocab^2, not corpus size; ONE row (the argmax) reaches the driver.
    The rewrite is the same doc-partitioned window stack (match flag ->
    run id by cumulative-sum -> run-parity apply -> consume right
    neighbor -> re-rank), all whole-stage-codegen expressions; the
    stream is localCheckpoint()ed per iteration to cut the iterative
    lineage (on a cluster: checkpoint to reliable storage). At 100 TB
    each iteration is one doc-partitioned pass + one tiny aggregate —
    the canonical distributed-BPE layout; nothing corpus-sized ever
    converges on the driver.

    Greedy-run-parity correctness: a match at rn can only chain with a
    match at rn+1 when left==right, so grouping consecutive matched
    rns (grp = rn - cumulative_match_count, constant within a run,
    strictly increasing across runs) and applying even offsets within
    each run reproduces leftmost-first non-overlapping application.

    Oracle: the identical trajectory re-derived in DuckDB as chained
    CTEs (oracle.py _bpe_cte) — exact integer counts and string
    equality only, no float hazard anywhere.
    """
    log, _ = _bpe_train(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        log, "step int, left string, right string, pair_count bigint, tokens_after bigint"
    ).orderBy("step")


def _bpe_train(spark: SparkSession, sf_dir: str, n_merges: int):
    """Run the q166 training loop; returns (trajectory rows, final
    encoded (doc_id, rn, tok) stream). Session-cached per
    (sf_dir, n_merges): q166 reads the trajectory, q169 reads the
    encoded stream — one training pass serves both (the stream is
    localCheckpoint()ed, so reuse costs nothing)."""
    cache = spark.__dict__.setdefault("_klrs_bpe_cache", {})
    ckey = (corpus_key(sf_dir, "documents"), n_merges)
    if ckey in cache:
        return cache[ckey]
    w_doc = Window.partitionBy("doc_id").orderBy("rn")
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select(
        "doc_id", F.posexplode(tokens()).alias("rn", "tok")
    ).localCheckpoint()
    n_docs = -1  # filled by the first stats pass
    log: list[tuple[int, str, str, int, int]] = []
    prev: tuple[str, str, int] | None = None
    for step in range(1, n_merges + 1):
        # ONE aggregate job returns both the argmax pair and the
        # current stream length: every doc of length n contributes
        # n-1 adjacencies, so tokens_now = sum(all pair counts)
        # + n_docs — no separate count() job per iteration. min of
        # struct(-c, l, r) IS the (count desc, l, r) tie-break.
        pc = (
            cur.select(
                "doc_id",
                F.col("tok").alias("l"),
                F.lead("tok").over(w_doc).alias("r"),
            )
            .filter(F.col("r").isNotNull())
            .groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        stats = pc.agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), "l", "r")
            ).alias("best"),
            F.sum("c").alias("tot_pairs"),
            F.count(F.lit(1)).alias("n_pairs"),
        ).collect()[0]
        if n_docs < 0:
            n_docs = docs.count()
        tokens_now = int(stats["tot_pairs"]) + n_docs
        if prev is not None:
            log.append((step - 1, *prev, tokens_now))
        l, r, c = (
            stats["best"]["l"],
            stats["best"]["r"],
            -int(stats["best"]["nc"]),
        )
        prev = (l, r, c)
        cur = _bpe_merge_step(cur, l, r).localCheckpoint()
    log.append((n_merges, *prev, cur.count()))
    cache[ckey] = (log, cur)
    return cache[ckey]


def q169_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer inference (r8): ENCODE the corpus with q166's learned
    merge table and report per-source compression — the measurement a
    tokenizer rollout runs before committing a vocabulary (does the
    learned table compress every source, or only the dominant one?).

    Applying a merge list in rank order is exactly re-running the
    training rewrites (each _bpe_merge_step is a deterministic
    function of the stream), so the encoded stream falls out of the
    same session-cached training pass q166 uses — no second loop. The
    per-source rollup is one groupBy over (doc_id -> n_after) joined
    to the documents dimension; compression is integer ppm
    (after * 1e6 DIV before), no float division.

    At 100 TB: inference is n_merges map-only window passes over the
    token stream (doc-partitioned, plan-pinned via _bpe_merge_step) —
    embarrassingly parallel across documents; the rollup shuffles one
    row per document.
    """
    _, stream = _bpe_train(spark, sf_dir, 8)
    after = stream.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", n_tokens().alias("nt")
    )
    return (
        docs.join(after, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("tokens_before"),
            F.sum("n_after").alias("tokens_after"),
        )
        .select(
            "source",
            "n_docs",
            "tokens_before",
            "tokens_after",
            # integer DIV, never float division + cast (truncation of a
            # double quotient can differ at representation boundaries)
            F.expr("(tokens_after * 1000000L) div tokens_before").alias(
                "compression_ppm"
            ),
        )
        .orderBy("source")
    )


def _bpe_merge_step(cur: DataFrame, l: str, r: str) -> DataFrame:
    """One greedy BPE rewrite of a (doc_id, rn, tok) stream: merge
    every leftmost-first non-overlapping (l, r) adjacency. All windows
    partition by doc_id (plan-pinned: never a global sort); the whole
    step is whole-stage-codegen expressions, map-side after one
    doc-partitioned sort."""
    w_doc = Window.partitionBy("doc_id").orderBy("rn")
    w_cum = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # when/otherwise: lead() is NULL on each doc's last row and the
    # flag must be 0 there, not NULL (cumulative SUM + lag read it)
    marked = cur.withColumn(
        "m",
        F.when(
            (F.col("tok") == F.lit(l))
            & (F.lead("tok").over(w_doc) == F.lit(r)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grouped = marked.withColumn(
        "grp",
        F.when(F.col("m") == 1, F.col("rn") - F.sum("m").over(w_cum)),
    )
    applied = grouped.withColumn(
        "ap",
        F.when(
            (F.col("m") == 1)
            & (
                (
                    F.col("rn")
                    - F.min("rn").over(Window.partitionBy("doc_id", "grp"))
                )
                % 2
                == 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        applied.withColumn(
            "cons", F.coalesce(F.lag("ap").over(w_doc), F.lit(0))
        )
        .filter(F.col("cons") == 0)
        .select(
            "doc_id",
            (F.row_number().over(w_doc) - 1).alias("rn"),
            F.when(F.col("ap") == 1, F.lit(l + " " + r))
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
    )


def q170_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT capacity-respecting next-fit packing (r8): q94's offset
    rule is streaming-friendly but lets a bin overflow its token
    capacity (a doc straddling the boundary lands in the bin its
    START falls in); this is the packing a sequence-length-strict
    trainer needs — a doc goes into the current bin only if it FITS
    (cum + nt <= 256), else opens a new bin; oversize docs get a bin
    alone. Emits one row per packed bin.

    Running-sum-with-reset is inherently sequential, so the stream is
    cut into BOUNDED groups first — bucket = doc_id DIV 128, <= 128
    docs per group by construction — and the sequential fold runs as
    a JVM ``aggregate()`` over each group's sorted collect_list array:
    one hash aggregate builds the <= 128-element per-group arrays, the
    fold assigns bins in-array, and posexplode + a second aggregate
    roll up per-bin stats. No Python anywhere. (The first cut ran the
    fold per-group via applyInPandas — semantically identical, but at
    sf~1 the ~39k small groups paid ~0.8 ms of per-group Arrow/pandas
    overhead each: 30.1 s vs 2.0 s for the in-array fold, the
    measured-negative recorded in PERF.md r8. Grouped-pandas is the
    right shape for LARGE per-group state; for <= 128-row groups the
    array fold wins by 15x.) At 100 TB the bucket key keeps per-group
    arrays constant-size; no global order, no driver loop.
    Bucket-relative packing is the documented semantic (each bucket
    packs independently), which is what makes it both exact AND
    distributed — the cross-bucket seam waste is bounded by
    cap/bucket_size per bucket.

    Oracle: the same fold as a DuckDB RECURSIVE CTE advancing one row
    per group per iteration (<= 128 iterations), then the identical
    per-bin rollup — integer arithmetic only.
    """
    cap, bucket_sz = 256, 128
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(f"doc_id div {bucket_sz}").alias("bucket"),
        "doc_id",
        n_tokens().alias("nt"),
    )
    grouped = docs.groupBy("lang", "bucket").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "nt"))).alias("items")
    )

    def fold_step(acc, x):
        # next-fit: open a new bin iff the doc does NOT fit (first doc
        # always lands in bin 0 because cum starts at 0)
        overflow = (acc["cum"] > 0) & (acc["cum"] + x["nt"] > cap)
        new_bin = F.when(overflow, acc["bin"] + 1).otherwise(acc["bin"])
        new_cum = F.when(overflow, x["nt"]).otherwise(acc["cum"] + x["nt"])
        return F.struct(
            new_bin.alias("bin"),
            new_cum.alias("cum"),
            F.concat(acc["bins"], F.array(new_bin)).alias("bins"),
        )

    init = F.struct(
        F.lit(0).cast("bigint").alias("bin"),
        F.lit(0).cast("bigint").alias("cum"),
        F.array().cast("array<bigint>").alias("bins"),
    )
    folded = grouped.select(
        "lang",
        "bucket",
        "items",
        F.aggregate("items", init, fold_step).getField("bins").alias("bins"),
    )
    per_doc = folded.select(
        "lang",
        "bucket",
        F.posexplode("items").alias("pos", "item"),
        "bins",
    ).select(
        "lang",
        "bucket",
        F.element_at(F.col("bins"), F.col("pos") + 1).alias("bin"),
        F.col("item.nt").alias("nt"),
    )
    return (
        per_doc.groupBy("lang", "bucket", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("tokens"))
        .select(
            "lang",
            "bucket",
            "bin",
            "n_docs",
            "tokens",
            F.expr(f"(tokens * 1000000L) div {cap}").alias("fill_ppm"),
        )
        .orderBy("lang", "bucket", "bin")
    )


def q177_span_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level quality pruning (r8): drop low-quality WINDOWS inside
    documents instead of whole documents — the RefinedWeb/CCNet-style
    line-level filter reshaped for token windows. Rule: a 16-token
    window is dropped iff its distinct-token ratio <= 2/3 (pure
    integer comparison 3*distinct <= 2*len — repetition-heavy spans),
    and the report is the per-source token-yield ledger (windows
    dropped, tokens kept/dropped, drop ppm) a curation run reads
    before committing the pruned corpus.

    Whole-document filters (q91/q92) throw away salvageable documents;
    span pruning keeps the clean 90% of a partly-degenerate doc. Plan
    shape: windows are per-row ``slice()`` expressions over the
    materialized token array (one scan, no join, no shuffle until the
    |sources|-row rollup) — whole-stage codegen end to end; the window
    spine is sequence(0, (n+15) div 16 - 1) so no float ceil crosses
    an engine boundary.
    """
    win = 16
    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens().alias("toks")
    )
    wins = docs.select(
        "source",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"(size(toks) + {win - 1}) div {win} - 1"),
            )
        ).alias("k"),
        "toks",
    ).select(
        "source",
        F.slice(F.col("toks"), F.col("k") * win + 1, win).alias("w"),
    )
    flagged = wins.select(
        "source",
        F.size("w").alias("wn"),
        (F.size(F.array_distinct("w")) * 3 <= F.size("w") * 2)
        .cast("int")
        .alias("dropped"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("dropped").alias("n_dropped"),
            F.sum(
                F.when(F.col("dropped") == 0, F.col("wn")).otherwise(0)
            ).alias("tokens_kept"),
            F.sum(
                F.when(F.col("dropped") == 1, F.col("wn")).otherwise(0)
            ).alias("tokens_dropped"),
        )
        .select(
            "source",
            "n_windows",
            "n_dropped",
            "tokens_kept",
            "tokens_dropped",
            F.expr(
                "(tokens_dropped * 1000000L) div (tokens_kept + tokens_dropped)"
            ).alias("drop_ppm"),
        )
        .orderBy("source")
    )


# The eval-manifest rule has exactly ONE definition (ADVICE r10:
# q191 re-implemented q178's bucket formula / pick key / quota inline,
# so a change to q178 would silently desync the regenerator's 'orig'):
# both the sampler (q178) and the regenerator (q191) consume these.
EVAL_CELL_QUOTA = 2


def eval_difficulty_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, len_bucket, difficulty_decile) — the stratification
    cell coordinates of the eval manifest: 64-token length buckets ×
    within-bucket unigram-difficulty deciles (per-bucket windows, the
    closed-form ((rn-1)*10) div cnt decile)."""
    from kinesis_logs_reader_spark.operators.textstats import (
        cached_unigram_scored,
    )

    scored = cached_unigram_scored(spark, sf_dir).select(
        "doc_id", "n_tok", "avg_logprob"
    )
    bucketed = scored.withColumn("len_bucket", F.expr("n_tok div 64"))
    w_rank = Window.partitionBy("len_bucket").orderBy("avg_logprob", "doc_id")
    w_cnt = Window.partitionBy("len_bucket")
    return (
        bucketed.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("cnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("difficulty_decile", F.expr("((rn - 1) * 10) div cnt"))
        .select("doc_id", "len_bucket", "difficulty_decile")
    )


def eval_pick_window() -> Window:
    """The deterministic per-cell pick order: min-md5 of doc_id (the
    repo's standard RNG-free sampling key, q96/q77 family)."""
    return Window.partitionBy("len_bucket", "difficulty_decile").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )


def q178_stratified_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difficulty-stratified eval-set construction (r8): sample 2 docs
    per (length bucket x within-bucket difficulty decile) cell — the
    balanced grid an eval harness needs so easy/short docs don't
    dominate the benchmark (uniform sampling reproduces the corpus
    skew; this reproduces the DIFFICULTY SURFACE).

    Difficulty = the q115 unigram score ranked WITHIN each 64-token
    length bucket (per-bucket windows, partitioned — never the global
    decile window q152's oracle twin uses; at 100 TB buckets are the
    parallelism), decile = the closed-form integer ((rn-1)*10) div
    cnt; the 2-per-cell pick is deterministic min-md5 (the repo's
    standard RNG-free sampling key, q96/q77 family). Ordering rides
    (avg_logprob, doc_id), the q152b-proven sort contract.

    Output: one row per sampled doc with its cell coordinates and
    cell population — the manifest a harness materializes.
    """
    with_dec = eval_difficulty_grid(spark, sf_dir)
    w_pick = eval_pick_window()
    w_cell = Window.partitionBy("len_bucket", "difficulty_decile")
    return (
        with_dec.withColumn("pick", F.row_number().over(w_pick))
        .withColumn("n_cell", F.count(F.lit(1)).over(w_cell))
        .filter(F.col("pick") <= EVAL_CELL_QUOTA)
        .select(
            "len_bucket",
            "difficulty_decile",
            F.col("pick").alias("rank"),
            "doc_id",
            "n_cell",
        )
        .orderBy("len_bucket", "difficulty_decile", "rank")
    )


def q179_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card (r8): the one-row-per-source datasheet a
    curation pipeline publishes with a shipped corpus — volume, length
    profile, exact-set duplicate rate, stopword density, and language
    purity, every field exact integer/string (no float crosses the
    engine boundary).

    q90 is the capstone that TRANSFORMS the corpus; this is the
    capstone that DESCRIBES it. One projected scan feeds two map-side-
    combinable aggregates: (a) per-source volume/length/stopword plus
    a distinct count of the q172 bag-of-words signature (the card's
    dup_ppm is the same normal-form family the novelty curve uses),
    (b) per-(source, lang) counts reduced to the dominant language via
    min(struct(-cnt, lang)) — the q166 argmax idiom, ties to the
    lexicographically smaller language. Shuffles carry |sources| and
    |sources x langs| rows at any corpus size.
    """
    from kinesis_logs_reader_spark.functions.text import stopword_count

    raw = load_table(spark, sf_dir, "documents")
    # spread_scan (r15): the tokenize + md5(sorted distinct tokens)
    # chain is per-row-heavy and feeds a (source, bow) aggregate whose
    # keys are near-unique (no map-side combining to overlap the scan)
    # — the q112/q92 digest-chain shape where the gated exchange wins
    # (guide §2.5). Only the heavy branch is spread; the dominant-lang
    # branch reads the raw scan (its (source, lang) projection is
    # cheap, the exchange would be pure latency — r14 doctrine).
    docs = spread_scan(raw).select(
        "source",
        "lang",
        n_tokens().alias("nt"),
        stopword_count().alias("sw"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens())))
        ).alias("bow"),
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("tokens"),
        F.max("nt").alias("max_len"),
        F.sum("sw").alias("sw_total"),
        F.countDistinct("bow").alias("n_distinct"),
    )
    dom = (
        raw.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.min(F.struct((-F.col("c")).alias("nc"), "lang")).alias("best")
        )
        .select(
            "source",
            F.col("best.lang").alias("dominant_lang"),
            (-F.col("best.nc")).alias("dom_count"),
        )
    )
    return (
        base.join(dom, "source")
        .select(
            "source",
            "n_docs",
            "tokens",
            F.expr("(tokens * 1000000L) div n_docs").alias("mean_len_ppm"),
            "max_len",
            F.expr("((n_docs - n_distinct) * 1000000L) div n_docs").alias(
                "dup_ppm"
            ),
            F.expr("(sw_total * 1000000L) div tokens").alias("stopword_ppm"),
            "dominant_lang",
            F.expr("(dom_count * 1000000L) div n_docs").alias(
                "lang_purity_ppm"
            ),
        )
        .orderBy("source")
    )


def q191_eval_split_regen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware eval-split REGENERATION (q164 × q181 closed
    into a loop, VERDICT r9 item 9): when the placement audit (q181)
    finds stratified eval picks (q178) whose near-dup cluster lands in
    'train'/'val' under the cluster-safe split (q164), the next step a
    real pipeline takes is not a report — it re-draws the manifest.
    Per (length-bucket × difficulty-decile) cell, re-rank only the
    ELIGIBLE documents (cluster-safe split == 'test') by the same
    deterministic min-md5 pick key and take the cell's quota (2).
    Because eligible ⊆ all and the pick key is unchanged, an original
    pick that was already safe keeps its slot (status 'kept'); unsafe
    picks are replaced by the next eligible docs ('replacement'); a
    cell with n_eligible < 2 cannot be filled and surfaces as such —
    the three outcomes a manifest regenerator must distinguish.

    Scale shape: the difficulty grid rides q115's corpus scoring pass;
    the split column is the q164 kernel (edge-bounded cluster frame
    joined in, then a pure hash expression); re-ranking is per-cell
    windows over cell-bounded partitions; the kept/replacement join is
    manifest-sized (≤ 2 rows per cell) on both sides. Nothing
    corpus-sized shuffles beyond the scoring pass itself.

    Oracle: composes the shared _CLUSTER_SPLIT_CTES with q178's
    scoring CTEs and re-derives the eligible re-pick in SQL.

    Reference analog: none (beyond-reference mandate; split hygiene,
    SURVEY §2.2 I).
    """
    from kinesis_logs_reader_spark.operators.dedup import (
        cluster_safe_assignment,
    )

    # SHARED manifest rule (grid, pick key, quota) — one definition
    # with q178, so the regenerator's notion of "the original pick"
    # cannot drift from the sampler's (ADVICE r10).
    with_dec = eval_difficulty_grid(spark, sf_dir)
    w_pick = eval_pick_window()
    orig = (
        with_dec.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") <= EVAL_CELL_QUOTA)
        .select("doc_id", F.lit(1).alias("was_orig"))
    )
    assign = cluster_safe_assignment(spark, sf_dir).select("doc_id", "split")
    eligible = with_dec.join(assign, "doc_id").filter(
        F.col("split") == "test"
    )
    w_cell = Window.partitionBy("len_bucket", "difficulty_decile")
    regen = (
        eligible.withColumn("pick", F.row_number().over(w_pick))
        .withColumn("n_eligible", F.count(F.lit(1)).over(w_cell))
        .filter(F.col("pick") <= EVAL_CELL_QUOTA)
    )
    return (
        regen.join(orig, "doc_id", "left")
        .select(
            "len_bucket",
            "difficulty_decile",
            F.col("pick").alias("rank"),
            "doc_id",
            F.when(F.col("was_orig") == 1, F.lit("kept"))
            .otherwise(F.lit("replacement"))
            .alias("status"),
            "n_eligible",
        )
        .orderBy("len_bucket", "difficulty_decile", "rank")
    )


def q193_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mixture-sampling plan: turn q114's temperature weights
    into an integer per-source QUOTA summing exactly to the sample
    budget (largest-remainder / Hamilton apportionment — floor(B*w)
    plus +1 to the largest remainders), then DRAW the quota
    deterministically (per-source min-md5 rank, the q96/q178 RNG-free
    pick) and prove the drawn set with a position-weighted checksum
    (the q161 idiom). This is the step between "here are the weights"
    (q114) and "here is tonight's training sample" — naive
    independent rounding of B*w_i over- or under-shoots the budget;
    Hamilton rounding is exact by construction. Quotas exceeding a
    tail source's population are capped and surfaced as ``shortfall``
    (single-pass contract: no iterative reallocation; the shortfall
    column is the signal to re-run with adjusted weights).

    Scale shape: one per-source partial aggregate; all apportionment
    arithmetic runs on the |sources|-bounded frame (its rank window is
    a bounded-frame SinglePartition — the q110b K-row-list precedent);
    the draw is a per-source rank window riding the corpus scan with
    the |sources|-row quota table broadcast back. Exactness: weights
    stay int64-quantized (floor(n^0.7 * 1e6 + 0.5)); quota arithmetic
    is pure integer div/mod; the checksum is sum(rank * doc_id) int64.

    Reference analog: none (beyond-reference mandate; training-data
    pipeline family — composes q114 × q96).
    """
    budget = 300
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    keyed = counts.withColumn(
        "k",
        F.floor(F.pow(F.col("n_docs").cast("double"), 0.7) * 1e6 + 0.5).cast(
            "bigint"
        ),
    )
    tot = keyed.agg(F.sum("k").alias("tot"))
    alloc = keyed.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({budget}L * k) div tot").alias("base"),
        F.expr(f"({budget}L * k) % tot").alias("rem"),
    )
    base_sum = alloc.agg(F.sum("base").alias("base_sum"))
    w_rem = Window.orderBy(F.col("rem").desc(), "source")
    quota = (
        alloc.crossJoin(F.broadcast(base_sum))
        .withColumn("rr", F.row_number().over(w_rem))
        .withColumn(
            "quota",
            F.col("base")
            + (F.col("rr") <= F.lit(budget) - F.col("base_sum")).cast("long"),
        )
        .select("source", "n_docs", "quota")
    )
    w_draw = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    drawn = (
        docs.withColumn("rnk", F.row_number().over(w_draw))
        .join(F.broadcast(quota.select("source", "quota")), "source")
        .filter(F.col("rnk") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_drawn"),
            F.sum(F.col("rnk") * F.col("doc_id")).alias("draw_checksum"),
        )
    )
    return (
        quota.join(drawn, "source", "left")
        .select(
            "source",
            "n_docs",
            "quota",
            F.coalesce(F.col("n_drawn"), F.lit(0)).alias("n_drawn"),
            (F.col("quota") - F.coalesce(F.col("n_drawn"), F.lit(0))).alias(
                "shortfall"
            ),
            F.coalesce(F.col("draw_checksum"), F.lit(0)).alias(
                "draw_checksum"
            ),
        )
        .orderBy("source")
    )


def q213_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document LINE-level boilerplate removal — the C4 /
    RefinedWeb rule the suite lacked: a line that repeats across many
    DOCUMENTS (nav menus, cookie banners, newsletter prompts) is
    boilerplate and is dropped from every document, however clean each
    individual occurrence looks. Distinct from q148 (whole-document
    template skeletons) and q92 (repetition WITHIN one document): the
    unit is the line, the evidence is cross-document frequency.

    The corpus has no newlines, so lines are deterministic 10-token
    chunks (q112's regex-chunker family) and two banner lines are
    planted in-query (the q148/q205 planted-structure discipline):
    every doc_id % 3 == 0 carries a newsletter banner, every % 5 == 0
    a cookie banner — so the boilerplate detector must fire on ~1/3
    and ~1/5 of the corpus while organic chunks (tiny shared vocab,
    but a 10-token sequence space far larger than the corpus) and the
    generator's planted exact-dup families (doc_freq 2-3) stay under
    the >= 30-docs threshold.

    Scale shape: ONE line-keyed exchange (the distinct (line, doc)
    grain then a per-line count — no count-distinct Expand), the tiny
    flagged-line set broadcast back over the line stream, and a
    map-side-combinable per-source report. Exactly the q40/q122 digest
    -exchange budget; retention in exact integer ppm.
    """
    from kinesis_logs_reader_spark.functions.generate import explode_nonempty

    docs = load_table(spark, sf_dir, "documents")
    banner1 = "please subscribe to our site newsletter for updates today"
    banner2 = "this site uses cookies by continuing you accept the policy"
    # organic 10-token chunks with group 0 EXPLICIT — Spark's
    # regexp_extract_all defaults to group 1 where DuckDB extracts the
    # full match (an engine divergence that silently extracted 2-token
    # fragments on first write); the banners join as STANDALONE line
    # elements, because appending them to the text would misalign with
    # every doc's chunk boundaries and never repeat verbatim.
    chunks = F.expr(
        r"regexp_extract_all(coalesce(text, ''), '\\S+( \\S+){0,9}', 0)"
    )
    empty = F.array().cast("array<string>")
    lines_arr = F.concat(
        chunks,
        F.when(F.col("doc_id") % 3 == 0, F.array(F.lit(banner1))).otherwise(
            empty
        ),
        F.when(F.col("doc_id") % 5 == 0, F.array(F.lit(banner2))).otherwise(
            empty
        ),
    )
    staged = docs.select("doc_id", "source", lines_arr.alias("_la"))
    lines = explode_nonempty(staged, F.col("_la"), "line", "doc_id", "source")
    # one distinct (line, doc) grain -> per-line doc frequency (no
    # Expand); the flagged set is tiny by construction and broadcasts
    boiler = (
        lines.select("line", "doc_id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 30)
        .select("line")
    )
    flagged = lines.join(
        F.broadcast(boiler.withColumn("_boiler", F.lit(1))), "line", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.coalesce(F.col("_boiler"), F.lit(0))).alias("n_removed"),
        )
        .select(
            "source",
            "n_lines",
            "n_removed",
            F.expr(
                "((n_lines - n_removed) * 1000000L) div n_lines"
            ).alias("retention_ppm"),
        )
        .orderBy("source")
    )
