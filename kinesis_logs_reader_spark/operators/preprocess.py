"""Training-data preprocessing operators (LLM-pipeline extension).

The reference's pipeline ends at "typed rows out" (SURVEY.md §2.1
R9/R14); a training-data engine needs the steps that come next. Each
operator here is a pure Catalyst expression chain — no Python in the
hot path — and each scales by construction:

- q76 merge/upsert: FULL OUTER join on the key + per-side coalesce —
  the batch MERGE INTO pattern. One shuffle on the merge key; at
  100 TB both sides arrive bucketed by key (sources/layout.py) and the
  shuffle disappears.
- q77 hash split: deterministic train/val/test assignment by md5 of
  the stable row key — never ``rand()``. Reproducible across engines,
  re-runs, and cluster sizes; sampling is a filter the scan can
  evaluate, not a separate pass.
- q78 normalize+dedup: canonicalize text (lowercase, collapse
  whitespace, strip punctuation) *before* hashing so trivially-varied
  copies collapse; group-by on the 16-byte md5 of the canonical form.
- q79 PII scrub: regexp masking of emails/IPv4s planted onto each doc;
  ``regexp_count`` audits how much was removed. All regexp work is
  JVM-side codegen.
- q80 chunking: fixed-size token windows via sequence+explode — the
  row-count fan-out is bounded (ceil(n_tokens/size) per doc), shuffle-
  free, and each chunk carries its provenance (doc_id, chunk_idx).
- q82 higher-order array funcs: transform/filter/exists/aggregate over
  the embedding column; the fold quantizes to integers first so the
  sum is order-independent and exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.functions.text import _base_hash
from kinesis_logs_reader_spark.operators.relational import _dec, _r2d
from kinesis_logs_reader_spark.sources.tables import load_table


def merge_upsert(
    target: DataFrame, source: DataFrame, key: str, columns: list[str]
) -> DataFrame:
    """Batch MERGE INTO: update matched rows, insert unmatched source
    rows, keep everything else. Returns the merged table plus an ``op``
    audit column ('update' / 'insert' / 'keep').

    FULL OUTER join on the key; each output column is
    ``coalesce(source, target)``. One shuffle on the merge key — the
    same plan a Delta/Iceberg MERGE compiles to for the copy-on-write
    case, minus the transaction log (out of scope: no table format in
    this container).
    """
    src = source.select(key, *columns)
    for c in columns:
        src = src.withColumnRenamed(c, f"_src_{c}")
    merged = target.join(src, on=key, how="full_outer")
    out_cols = [F.col(key)]
    for c in columns:
        out_cols.append(F.coalesce(F.col(f"_src_{c}"), F.col(c)).alias(c))
    op = (
        F.when(F.col(f"_src_{columns[0]}").isNull(), F.lit("keep"))
        .when(F.col(columns[0]).isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op")
    )
    return merged.select(*out_cols, op)


def q76_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a deterministic change-set into orders: every 7th order
    gets a 10% price bump + status 'U' (update); every 97th order is
    re-keyed at +10M (insert)."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        _r2d(_dec("o_totalprice")).alias("price"),
    )
    bump = _r2d(_dec("o_totalprice") * F.lit("1.1").cast("decimal(2,1)"))
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit("U").alias("status"), bump.alias("price")
    )
    inserts = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("N").alias("status"),
        _r2d(_dec("o_totalprice")).alias("price"),
    )
    source = updates.unionByName(inserts)
    return merge_upsert(
        target, source, key="o_orderkey", columns=["status", "price"]
        # the merge's full-outer SMJ leaves output clustered+sorted on
        # the key; per-partition sort avoids a second range exchange
    ).sortWithinPartitions("o_orderkey")


def q77_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: bucket = md5(doc_id) mod 100
    -> 80/10/10. Counts per (split, lang) prove the assignment is
    identical in both engines. The split is a pure filter expression —
    at 100 TB it rides the scan, costs zero extra passes, and never
    changes when the table is repartitioned or appended to."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _base_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split")
    )
    return (
        docs.select(split, "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


def q161_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order generation (r7): per-epoch document
    permutation + shard assignment, the step that turns a curated
    corpus into a reproducible training data order.

    Complements q156 (deterministic proportional interleave: WHICH
    source feeds the next slot) and q77 (static membership split):
    q161 is the intra-corpus RANDOMIZATION + PARALLELISM layer — which
    worker owns which documents, in what order, differently each
    epoch. Real pipelines need three properties q77's static split
    does not give: (1) a DIFFERENT order every epoch, (2) byte-reproducible
    across re-runs, cluster sizes, and engines — never ``rand()`` —
    and (3) balanced shards whose contents are provable without
    shipping the full permutation. Shard = md5-hash of
    ``(epoch, doc_id)`` mod 8; within-shard position = rank by the
    same hash (ties by doc_id). The audit output pins the whole
    permutation order-insensitively: per (epoch, shard) the doc count,
    the position-weighted checksum ``sum(position * doc_id)`` (any
    transposition of two docs changes it), and the first-position doc.

    Scale shape: the only shuffle is the (epoch, shard)-partitioned
    rank window — (16-byte hash + two ints) per row, never text; with
    8 shards x E epochs the sort parallelism is 8E independent
    partitions, and at 100 TB the within-shard rank swaps onto the
    q152b range-rank machinery (per-range row_number + count-vector
    offsets) so no single sort sees more than a range slice.
    Checksum overflow envelope: position <= |shard| and doc_id <= 1e7
    at tested SFs keeps ``sum(pos * id)`` under 2^50; a 1e12-doc
    deployment would reduce the checksum mod 2^61-1 on both engines.

    Reference analog: none (beyond-reference mandate; the reference
    replays events in arrival order, kinesis_logs_reader.py:97-104).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        epoch_shuffle_ranked(docs)
        .groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("perm_checksum"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
        )
        .orderBy("epoch", "shard")
    )


def epoch_shuffle_ranked(
    docs: DataFrame, epochs: int = 2, n_shards: int = 8
) -> DataFrame:
    """The q161 permutation as rows: (doc_id, epoch, shard, pos, _k).

    Shared by the q161 audit aggregate and
    :func:`kinesis_logs_reader_spark.sources.layout.write_training_shards`,
    which materializes the same order as consumable per-shard files —
    the two views are the same DAG, so the audit certifies exactly
    what the writer ships.
    """
    from pyspark.sql.window import Window

    staged = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(
                ":",
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("_k"),
    )
    sharded = staged.select(
        "doc_id",
        "epoch",
        "_k",
        (_base_hash_of_hex("_k") % n_shards).alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("_k", "doc_id")
    return sharded.select(
        "doc_id", "epoch", "shard", "_k", F.row_number().over(w).alias("pos")
    )


def _base_hash_of_hex(col: str) -> F.Column:
    """61-bit integer from an ALREADY-COMPUTED md5 hex column (the
    same conv-substring reduction as functions.text._base_hash, minus
    the inner md5 — the hex is reused for both shard and order)."""
    from kinesis_logs_reader_spark.functions.text import MINHASH_P

    return (
        F.conv(F.substring(F.col(col), 1, 15), 16, 10).cast("bigint") % MINHASH_P
    )


# Every ASCII char (0x00-0x7F) outside the canonical keep-set
# [a-z0-9 ]; uppercase is absent post-lower() but harmless to list.
_ASCII_DELETE = "".join(
    chr(i) for i in range(128) if chr(i) not in "abcdefghijklmnopqrstuvwxyz0123456789 "
)


def normalize_text(col, unicode_safe: bool = False) -> F.Column:
    """Canonical form: lowercase, strip non-alnum-non-space, collapse
    runs of whitespace, trim.

    Fast path (default): ``translate`` deletes the 91 ASCII non-keep
    chars via a per-char lookup — no regex engine — then
    split/filter/array_join collapses space runs and trims in one
    pass. Byte-identical to the regex form for any ASCII input
    (r9 A/B at sf~1: 4.06 s -> 0.84 s on the q78 kernel, 0 digest
    diffs corpus-wide; the documents corpus is pure ASCII, verified
    max codepoint 121). Non-ASCII codepoints are NOT deleted by the
    fast path — for general Unicode corpora pass ``unicode_safe=True``
    to get the regex form (DuckDB twin: regexp_replace with 'g').
    """
    c = F.lower(col)
    if unicode_safe:
        c = F.regexp_replace(c, "[^a-z0-9 ]+", "")
        c = F.regexp_replace(c, "  +", " ")
        return F.trim(c)
    c = F.translate(c, _ASCII_DELETE, "")
    return F.array_join(F.filter(F.split(c, " "), lambda x: x != ""), " ")


def cached_canonical_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE corpus-wide canonical-digest frame shared by every consumer
    of the normalize → md5 kernel (VERDICT r9 item 8: q78/q90/q118
    each recomputed it; the q46 pair-frame session-cache convention
    applies directly).

    Columns: (doc_id, lang, text_len, nt, n_stop, h) — the union of
    what the three consumers read: q78 needs h; q118 needs doc_id,
    text_len, h; q90's curate needs doc_id, lang, h plus the quality
    ingredients nt (token count) and n_stop (stopword count), both
    exact ints so the derived quality double is bit-identical to the
    from-raw-text form. Session-persisted per sf_dir (stale corpora
    unpersist); in a 100 TB deployment this IS the materialized
    canonical-digest store a dedup pipeline maintains anyway (the q160
    index convention), ~50 bytes/row vs re-running translate+md5 over
    the full text per query.

    Per-query planted variants (q78/q118's uppercased doubled-space
    re-emissions) are NOT in this frame — they are fixed 15-row slices,
    so each query normalizes its own plants raw; only the corpus-sized
    side is shared.
    """
    from kinesis_logs_reader_spark.functions.text import (
        n_tokens,
        stopword_count,
    )

    from kinesis_logs_reader_spark.functions.caching import (
        corpus_key,
        lru_persisted,
    )

    def _build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id",
            "lang",
            F.length("text").alias("text_len"),
            n_tokens().alias("nt"),
            stopword_count().alias("n_stop"),
            F.md5(normalize_text(F.col("text"))).alias("h"),
        )

    return lru_persisted(
        spark,
        "_klrs_canon_digest_cache",
        corpus_key(sf_dir, "documents"),
        _build,
    )


def q78_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize-then-dedup: docs whose *canonical* text collides.

    Catches trivially-varied duplicates (case, punctuation, spacing)
    that exact dedup (q40) misses. Variants are planted in-query
    (docs with id < 15 re-emitted uppercased with doubled spaces) so
    the collision structure is guaranteed and engine-independent; the
    group-by key is the md5 of the canonical form, so the shuffle
    carries 16-byte digests. The corpus-sized digest side comes from
    the shared cached_canonical_digests frame (r10); the 15 planted
    rows normalize raw, so the kernel is still exercised end-to-end on
    the planted path and the oracle recomputes everything from text.
    """
    dig = cached_canonical_digests(spark, sf_dir).select(
        F.col("h").alias("_h")
    )
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 15)
        .select(
            F.md5(
                normalize_text(
                    F.regexp_replace(F.upper(F.col("text")), " ", "  ")
                )
            ).alias("_h")
        )
    )
    return (
        dig.unionByName(planted)
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .groupBy("n_copies")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy("n_copies")
    )


_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_IP_RE = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"


def q79_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: plant a deterministic email + IPv4 per doc, then
    mask both and audit the removal counts. regexp_replace/regexp_count
    are whole-stage-codegen expressions; at 100 TB this is a map-only
    pass with zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from "),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.0.1"),
        ).alias("t"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_IP_RE)).alias("n_ips"),
        F.substring(scrubbed, -40, 40).alias("tail"),
    ).orderBy("doc_id")


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 32, text_col: str = "text"
) -> DataFrame:
    """Fixed-size token-window chunking with provenance.

    One row per (doc, window): sequence+explode fan-out, slice+concat
    re-materialization. No shuffle — chunking is embarrassingly
    parallel and the fan-out factor is bounded by doc length.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    return (
        docs.withColumn("_toks", toks)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_toks"),
                    F.col("chunk_idx") * chunk_tokens + 1,
                    chunk_tokens,
                ),
            ).alias("chunk"),
        )
    )


def q80_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk a fixed doc slice into 32-token windows; emit md5 + token
    count per chunk (hashes keep the oracle output compact)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    chunks = chunk_documents(docs, chunk_tokens=32)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(F.split(F.col("chunk"), " ")).alias("n_tokens"),
        F.md5(F.col("chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


def q82_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings: transform / filter
    / exists / aggregate. The fold quantizes each element to integer
    milli-units before summing, so the result is order-independent and
    bit-exact in both engines (no float-summation drift by design)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    milli = F.transform(as_double, lambda x: F.floor(x * 1000).cast("bigint"))
    return emb.select(
        "vec_id",
        F.size(F.filter(as_double, lambda x: x > 0)).alias("n_pos"),
        F.exists(as_double, lambda x: x > 0.25).alias("any_big"),
        F.aggregate(milli, F.lit(0).cast("bigint"), lambda a, v: a + v).alias(
            "sum_milli"
        ),
        F.round(F.element_at(as_double, 1) * 2, 4).cast("double").alias("head_x2"),
    ).orderBy("vec_id")


def dedup_incremental(new_docs: DataFrame, known_hashes: DataFrame) -> DataFrame:
    """Incremental corpus dedup: admit only new-batch documents whose
    canonical-text hash is (a) unseen in the historical fingerprint
    store and (b) unique within the batch (smallest doc_id wins).

    The production shape for a growing 100 TB corpus: the store is a
    parquet table of 16-byte digests only — the anti join shuffles
    digests, never text, and within-batch dedup is the same min_by
    aggregation as the capstone pipeline. Returns the surviving rows
    with their ``_h`` digest attached so the caller can append exactly
    these hashes back to the store (read-side and write-side stay
    consistent by construction).
    """
    hashed = new_docs.withColumn("_h", F.md5(normalize_text(F.col("text"))))
    batch_unique = (
        hashed.groupBy("_h")
        .agg(F.min_by(F.struct(*new_docs.columns), "doc_id").alias("row"))
        .select("_h", "row.*")
    )
    return batch_unique.join(known_hashes.select("_h"), "_h", "left_anti")


def q104_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup semantics, oracle-checkable: docs < 300 are
    the historical store; docs 200-499 arrive as the new batch (100
    overlapping). Output: admitted docs (unseen canonical hash, unique
    in batch, min doc_id per hash)."""
    docs = load_table(spark, sf_dir, "documents")
    known = docs.filter(F.col("doc_id") < 300).select(
        F.md5(normalize_text(F.col("text"))).alias("_h")
    )
    new_batch = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 500)).select(
        "doc_id", "text", "lang"
    )
    kept = dedup_incremental(new_batch, known)
    return kept.select("doc_id", "lang").orderBy("doc_id")


def q111_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step before shipping vectors to an ANN index or a
    feature store (4x smaller than float32, 8x smaller than float64).

    Per vector: scale = max|x| / 127, code_i = floor(x_i * 127 /
    max|x| + 0.5). Everything is a per-row higher-order-function chain
    (transform / array_max / aggregate) running inside whole-stage
    codegen — map-only over the scan, no shuffle, no Python.

    Exactness across engines: float32 -> double casts are exact, the
    multiply-divide chain is written with explicit parentheses so both
    engines evaluate the identical double expression, and the audit
    sums (|code| L1 mass, saturation count) are integer aggregates
    with a bigint accumulator — no float-sum-order nondeterminism.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    amax = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    # amax is referenced twice (scale + every code) -> project it into
    # its own column first so it materializes once per row
    staged = (
        emb.select("vec_id", amax.alias("_amax"), "embedding")
        .select(
            "vec_id",
            F.round(F.col("_amax") / 127.0, 6).cast("double").alias("scale"),
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(
                    (v.cast("double") * 127.0) / F.col("_amax") + 0.5
                ).cast("bigint"),
            ).alias("codes"),
        )
    )
    return (
        staged.select(
            "vec_id",
            "scale",
            F.aggregate(
                "codes",
                F.lit(0).cast("bigint"),
                lambda acc, c: acc + F.abs(c),
            ).alias("code_l1"),
            F.size(F.filter("codes", lambda c: F.abs(c) == 127)).alias("n_sat"),
            F.size(F.filter("codes", lambda c: c == 0)).alias("n_zero"),
        )
        .orderBy("vec_id")
    )


def q124_reconstruct_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk -> reconstruct round-trip audit: re-assemble each document
    from its q80 chunks (order by chunk_idx, join with spaces) and
    verify byte-identity with the original text. The invertibility
    guarantee a chunking pipeline must hold before chunks replace
    documents downstream — run after any chunker change.

    Reconstruction is one groupBy over (doc, chunk) rows using
    sort_array over (chunk_idx, chunk) structs — exact order without a
    window sort; the comparison joins the original text back by doc_id.
    Emits md5 digests, not text, so the audit output stays narrow.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    chunks = chunk_documents(docs, chunk_tokens=32)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt"),
        )
    )
    return (
        rebuilt.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            F.md5("rebuilt").alias("rebuilt_md5"),
            (F.md5("rebuilt") == F.md5("text")).alias("roundtrip_ok"),
        )
        .orderBy("doc_id")
    )


def q153_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-shift audit: what exact dedup does to each source's
    share of the corpus. Dedup is not mixture-neutral — a source that
    is 30% of raw bytes but mostly copies can drop to 10% of the
    deduplicated corpus, silently re-weighting training data. This
    reports per-source docs before, survivors after (keep = min doc_id
    per md5 group, q40's rule), and the share drift in micro-units.

    Copies are planted in-query (docs id < 25 re-emitted at id+5000000
    under a skewed source label 'mirror') so one source is duplicate-
    heavy by construction and must lose share. Scale shape: survivor
    attribution is min_by(source, doc_id) INSIDE the one 16-byte-digest
    aggregate — no join back to the corpus at all; everything after is
    |sources|-bounded. Shares are exact int64 micro-unit ratios.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.lit("mirror").alias("source"),
        "text",
    )
    base = docs.unionByName(planted).select(
        "doc_id", "source", F.md5("text").alias("_h")
    )
    keep = base.groupBy("_h").agg(
        F.min_by("source", "doc_id").alias("source")
    )
    pre = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    post = keep.groupBy("source").agg(F.count(F.lit(1)).alias("n_after"))
    joined = (
        pre.join(post, "source", "left")
        .select(
            "source",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )
    # Corpus totals as a GLOBAL window over the |sources|-row frame, not
    # a separate .agg() branch: referencing `joined` from two subtrees
    # would re-run the whole digest aggregate (plan-verified — the agg
    # formulation duplicated the min_by exchange), while the unbounded
    # window is one exchange of ~|sources| rows.
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    return (
        joined.withColumn("tb", F.sum("n_before").over(w_all))
        .withColumn("ta", F.sum("n_after").over(w_all))
        .select(
            "source",
            "n_before",
            "n_after",
            (F.floor(F.col("n_before") * 1000000 / F.col("tb")))
            .cast("bigint")
            .alias("share_before_micro"),
            (F.floor(F.col("n_after") * 1000000 / F.col("ta")))
            .cast("bigint")
            .alias("share_after_micro"),
        )
        .withColumn(
            "share_drift_micro",
            F.col("share_after_micro") - F.col("share_before_micro"),
        )
        .orderBy("source")
    )


def q192_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard manifest — the WRITER side of
    training-data prep: documents in shuffled training order (the q161
    md5-key order family) are packed document-contiguously into
    fixed-token-budget shards by cumulative token offset; a document
    belongs to the shard where its token stream STARTS (the standard
    pre-packing layout upstream of q94/q170's sequence packers). The
    manifest rows (shard_id, n_docs, n_tokens, start/end offsets) are
    what a 100 TB run hands its shard writers.

    Plan shape — the q152b two-phase global-prefix-sum idiom on a
    second surface: ``repartitionByRange`` on the total-order key
    splits the corpus into ordered ranges, per-range token prefix sums
    run as partitionBy(_pid) windows in parallel, and the only
    driver-side data is the per-partition token-total vector whose
    prefix sums (broadcast back) lift local sums to exact global
    offsets. shard_id is then closed-form integer division — map-only.
    Nothing corpus-sized is globally sorted on one task. Oracle keeps
    the single global window as the exactness twin.

    Reference analog: none (beyond-reference mandate; training-data
    pipeline family, SURVEY §2.2 I).
    """
    budget = 2048
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("nt"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    from pyspark.sql.window import Window

    from kinesis_logs_reader_spark.functions.caching import (
        corpus_key,
        lru_persisted,
    )

    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 2)
    ranged = lru_persisted(
        spark,
        "_klrs_q192_cache",
        (corpus_key(sf_dir, "documents"), nparts),
        lambda: docs.repartitionByRange(nparts, "k", "doc_id").withColumn(
            "_pid", F.spark_partition_id()
        ),
    )
    # bounded driver step: one token-total row per range partition
    totals = sorted(
        (r["_pid"], r["t"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum("nt").alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += int(t)
    off_df = spark.createDataFrame(offsets, "_pid int, _off bigint")
    w = Window.partitionBy("_pid").orderBy("k", "doc_id")
    staged = (
        ranged.withColumn("_cum_incl", F.sum("nt").over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            "cum_before", F.col("_off") + F.col("_cum_incl") - F.col("nt")
        )
    )
    return (
        staged.withColumn(
            "shard_id", F.expr(f"cum_before div {budget}").cast("bigint")
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.min("cum_before").alias("start_offset"),
            F.max(F.col("cum_before") + F.col("nt")).alias("end_offset"),
        )
        .orderBy("shard_id")
    )


# q204 layout-advisor geometry: 64 files per candidate layout, a
# Morton curve over 11-bit (user, hour) coordinates, and a probe box
# RELATIVE to the corpus extents (second eighth of each range:
# [max div 8, max div 4]) so the box is non-empty at every SF.
_LAYOUT_FILES = 64
_LAYOUT_BITS = 5


def q204_zorder_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered-layout advisor (r13, VERDICT r12 item 7b): which file
    clustering should the events table be WRITTEN in so a 2-D box
    predicate (user x time window — the canonical training-data slice)
    skips the most files on min/max footer stats? Pairs
    ``sources/layout.py``'s Z-order writer (``morton_z`` /
    ``zorder_write``) with a declared, oracle-backed analysis: the
    advisor simulates the three candidate layouts the writer supports
    — ``sort_x`` (cluster by user), ``sort_y`` (cluster by hour),
    ``zorder`` (Morton interleave, the 2-D compromise) — and reports,
    per layout, the files an engine would have to READ for the probe
    box. q192 plans the shard CONTENTS; this plans the shard ORDER.

    Simulation semantics (exactly what parquet row-group skipping
    does): each layout assigns every row to one of 64 equi-width files
    along its clustering key (``key * 64 div (key_max + 1)`` — integer
    division on broadcast scalar maxima, not a sampled range
    partitioner, so the assignment is deterministic and the DuckDB
    oracle replays it bit-for-bit); a file must be read iff its
    per-file (min_x..max_x, min_y..max_y) bounding box intersects the
    probe box ([max div 8, max div 4] of each coordinate — relative to
    the corpus extents so the probe stays non-empty at every SF).
    Coordinates: x = user_id, y = hour(ts) - min hour, each
    equi-width-snapped to a dense 5-bit grid cell before the Morton
    interleave (grid-snap-then-curve — see the inline note).

    Output per layout (all integers): occupied files, files hit,
    files_pruned_ppm, rows_scanned (sum over hit files), rows_matching
    (true box selectivity — layout-invariant), read_amp_ppm
    (rows_scanned vs rows_matching), and the advisor's pick
    (recommended = minimal rows_scanned, ties to layout name). On this
    corpus the Z-order layout wins by construction — a user-sorted
    layout reads every file for a time-windowed slice, an hour-sorted
    one reads every file for a user slice, the curve bounds both.

    Scale shape: ONE corpus scan -> the (layout, file) assignment
    EXPLODES 3 rows per event -> groupBy(layout, file) partial-
    aggregates map-side into <= 3x64 groups, so the only corpus-scale
    exchange carries <= 192 rows of int mins/maxes/counts; the scalar
    maxima and the box-selectivity count broadcast (the sanctioned
    one-row crossJoin idiom); the final intersect/recommend pass runs
    on 3 rows. At 100 TB this is a metadata-cost planning query: the
    corpus is read once, nothing corpus-sized shuffles.

    Reference analog: none (beyond-reference mandate; the layout
    family: sources/layout.py writers, q192 shard plan, q201 skew
    advisor).
    """
    from kinesis_logs_reader_spark.sources.layout import morton_z

    m, bits = _LAYOUT_FILES, _LAYOUT_BITS
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("x"),
        F.expr("unix_seconds(cast(ts as timestamp)) div 3600").alias("hr"),
    )
    base = ev.groupBy().agg(F.min("hr").alias("hr0"))
    pts = ev.join(F.broadcast(base)).select(
        "x", (F.col("hr") - F.col("hr0")).alias("y")
    )
    maxes = pts.groupBy().agg(
        F.max("x").alias("xm"), F.max("y").alias("ym")
    )
    # grid-snap-then-curve: equi-width-bucket each dimension to 2^bits
    # DENSE cells first (0..2^bits-1 — on a uniform corpus this is the
    # deterministic stand-in for the writer's range partitioner), then
    # interleave; every curve position is populated, so the 64 file
    # cuts are equi-height and each file covers a tight 2-D box. An
    # equi-width cut of the RAW Morton domain was measured leaving
    # 2/3 of the file slots empty (the interleave of <2^11-bounded
    # coordinates occupies a sparse sub-lattice).
    # spread_scan A/B (r14): OFF wins 0.40 vs 0.52 s — the morton
    # arithmetic is integer-cheap and the downstream cell aggregate
    # combines map-side; the exchange was pure latency.
    # Measured-negative.
    snapped = pts.join(F.broadcast(maxes)).select(
        "x",
        "y",
        F.expr(f"x * {2 ** bits}L div (xm + 1L)").alias("xs"),
        F.expr(f"y * {2 ** bits}L div (ym + 1L)").alias("ys"),
    )
    z_cells = (1 << (2 * bits))
    assigned = snapped.withColumn(
        "z", morton_z(F.col("xs"), F.col("ys"), bits=bits)
    ).select(
        "x",
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("sort_x").alias("layout"),
                    F.expr(f"xs * {m}L div {2 ** bits}L").alias("file"),
                ),
                F.struct(
                    F.lit("sort_y").alias("layout"),
                    F.expr(f"ys * {m}L div {2 ** bits}L").alias("file"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"z * {m}L div {z_cells}L").alias("file"),
                ),
            )
        ).alias("lf"),
    )
    files = (
        assigned.groupBy("lf.layout", "lf.file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    box = [
        F.expr("xm div 8").alias("x_lo"),
        F.expr("xm div 4").alias("x_hi"),
        F.expr("ym div 8").alias("y_lo"),
        F.expr("ym div 4").alias("y_hi"),
    ]
    hit = (
        (F.col("min_x") <= F.col("x_hi"))
        & (F.col("max_x") >= F.col("x_lo"))
        & (F.col("min_y") <= F.col("y_hi"))
        & (F.col("max_y") >= F.col("y_lo"))
    )
    files = files.join(F.broadcast(maxes.select(*box)))
    matching = (
        pts.join(F.broadcast(maxes.select(*box)))
        .filter(
            (F.col("x") >= F.col("x_lo"))
            & (F.col("x") <= F.col("x_hi"))
            & (F.col("y") >= F.col("y_lo"))
            & (F.col("y") <= F.col("y_hi"))
        )
        .groupBy()
        .agg(F.count(F.lit(1)).alias("rows_matching"))
    )
    per_layout = (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(hit.cast("int")).alias("n_files_hit"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0))).alias(
                "rows_scanned"
            ),
        )
        .join(F.broadcast(matching))
        .select(
            "layout",
            "n_files",
            "n_files_hit",
            F.expr(
                f"(n_files - n_files_hit) * 1000000L div n_files"
            ).alias("files_pruned_ppm"),
            "rows_scanned",
            "rows_matching",
            F.expr(
                "rows_scanned * 1000000L div greatest(rows_matching, 1L)"
            ).alias("read_amp_ppm"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("rows_scanned", "layout")
    return (
        per_layout.withColumn(
            "recommended", (F.row_number().over(w) == 1)
        )
        .orderBy("layout")
    )
