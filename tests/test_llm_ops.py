"""LLM-pipeline operator tests beyond the SQL oracle: simhash vs a
pure-Python reference, MinHash-LSH recall on planted duplicates, ANN
recall vs the exact baseline, and multimodal decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.operators import dedup, multimodal, similarity
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_simhash_matches_pure_python(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    got = {
        r.doc_id: r.simhash
        for r in docs.select("doc_id", dedup.simhash_udf(F.col("text")).alias("simhash")).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in texts.items():
        assert got[doc_id] == format(dedup._simhash_one(text), "016x")


def test_simhash_near_dup_small_hamming(spark):
    """A lightly-edited copy must land within small Hamming distance."""
    [row] = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") == 0).collect()
    orig = dedup._simhash_one(row.text)
    toks = row.text.split(" ")
    toks[len(toks) // 2] = "EDITED"
    edited = dedup._simhash_one(" ".join(toks))
    hamming = bin(orig ^ edited).count("1")
    assert hamming <= 12  # near-dup: far below the ~32 expected for random


def test_minhash_lsh_finds_planted_dups(spark):
    """q46 plants exact copies of docs 0..19 at id+1000000; every planted
    pair must be recovered (exact dup -> identical signature -> all bands
    collide)."""
    pairs = {
        (r.ida, r.idb)
        for r in dedup.q46_minhash_lsh(spark, SF_DIR).collect()
    }
    for i in range(20):
        assert (i, i + 1000000) in pairs


def test_ann_recall_vs_exact(spark):
    """LSH-bucketed ANN must recover most of the exact top-5 (Hamming-1
    probe of 64 buckets over 500 vectors)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = [r.vec_id for r in similarity.cosine_topk(emb, 0, 5).collect()]
    approx = {r.vec_id for r in similarity.ann_topk(emb, 0, 5).collect()}
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.4, f"ANN recall too low: {recall} ({approx} vs {exact})"


def test_ann_bucket_assignment_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    b1 = [r.b for r in emb.select(similarity.bucket_of(F.col("embedding")).alias("b")).collect()]
    b2 = [r.b for r in emb.select(similarity.bucket_of(F.col("embedding")).alias("b")).collect()]
    assert b1 == b2
    assert all(0 <= b < 64 for b in b1)


def test_multimodal_decode_plumbing(spark):
    """mapInPandas decode stage: schema, batching, deterministic output."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(50)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    out = multimodal.decode_images(docs, buckets=4)
    assert out.schema == multimodal.DECODED_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 50
    sample = next(iter(rows.values()))
    assert len(sample.features) == 8
    assert sample.n_bytes > 0 and sample.width >= 16 and sample.height >= 16
    # deterministic across runs
    rows2 = {r.doc_id: r for r in multimodal.decode_images(docs, buckets=4).collect()}
    assert {k: (v.width, v.height) for k, v in rows.items()} == {
        k: (v.width, v.height) for k, v in rows2.items()
    }


@pytest.mark.skipif(not multimodal.HAVE_PIL, reason="Pillow not installed")
def test_multimodal_real_codec(spark):
    """Real Pillow path (skipped where image libs are absent): decode a
    generated PNG through the same mapInPandas stage as the fake."""
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (12, 7), (200, 10, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    docs = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    row = multimodal.decode_images(docs, codec="real").collect()[0]
    assert (row.width, row.height) == (12, 7)
    assert len(row.features) == 8 and all(0.0 <= f <= 1.0 for f in row.features)
    thumb = multimodal.resize_images(docs, 8, 8, codec="real").collect()[0]
    assert len(bytes(thumb.thumb)) == 64


def test_real_codec_raises_without_pil():
    """codec='real' must fail loudly, never silently fake."""
    if multimodal.HAVE_PIL:
        pytest.skip("Pillow installed; loud-failure path not reachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"not-an-image")


def test_multimodal_resize_plumbing(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(20)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    out = multimodal.resize_images(docs, 8, 8)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 8 and r.height == 8 and len(bytes(r.thumb)) == 64 for r in rows)


def test_multimodal_frame_sample_fanout(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(10)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    out = multimodal.sample_frames(docs, n_frames=4)
    rows = out.collect()
    assert len(rows) == 40  # one row fans out to n_frames rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_multimodal_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\x89PNG...")


def test_ivf_kmeans_recall_vs_exact(spark):
    """IVF with learned centroids probes 4/16 cells and must recover
    most of the exact top-5."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = [r.vec_id for r in similarity.cosine_topk(emb, 0, 5).collect()]
    approx = {r.vec_id for r in similarity.ivf_topk(emb, 0, 5).collect()}
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall} ({approx} vs {exact})"


def test_kmeans_assignment_covers_all_rows(spark):
    """Every vector lands in exactly one cluster in [0, n_clusters)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = similarity.kmeans_centroids(emb, n_clusters=8, n_iter=2)
    assigned = similarity.assign_clusters(emb, cents)
    assert assigned.count() == emb.count()
    rng = assigned.agg(
        F.min("cluster").alias("lo"), F.max("cluster").alias("hi")
    ).first()
    assert rng.lo >= 0 and rng.hi < 8


def test_connected_components_semantics(spark):
    """Chain 1-2-3, isolated pair 10-11, triangle 20-21-22 with an
    extra chord: labels = component minimum, chains collapse fully."""
    from kinesis_logs_reader_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "ida long, idb long",
    )
    expect = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    # driver union-find regime
    got = {(r.node, r.cluster_id) for r in connected_components(edges).collect()}
    assert got == expect
    # distributed label-propagation regime (force with threshold=0)
    got_dist = {
        (r.node, r.cluster_id)
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert got_dist == expect


def test_semdedup_drops_planted_copies(spark):
    """q109 plants exact copies of vec_id 0..9 at id+1000000. An exact
    copy lands in the same k-means cell as its original (identical
    vector -> identical argmin), cosine 1.0 >= any threshold, so every
    planted id must be dropped with dup_of pointing back at a <2000 id."""
    dropped = {
        r.vec_id: r.dup_of
        for r in similarity.q109_semdedup(spark, SF_DIR).collect()
    }
    for i in range(10):
        assert i + 1000000 in dropped, f"planted copy {i} survived"
        assert dropped[i + 1000000] < 2000


def test_short_document_shingles_are_empty(spark):
    """Docs with < k tokens must yield EMPTY shingle arrays, not fault.

    Regression: sequence(1, 0) defaults to step -1 in Spark, producing a
    descending [1, 0] whose element_at(0) faults (DuckDB's
    generate_series(1, 0) is empty, so unguarded code also diverged).
    """
    from kinesis_logs_reader_spark.functions.text import (
        shingles,
        token_base_hashes,
        token_shingle_hashes,
    )

    df = spark.createDataFrame(
        [(1, "one"), (2, "two tokens"), (3, "now three tokens"), (4, "")],
        "doc_id long, text string",
    )
    tok = df.select("doc_id", token_base_hashes().alias("tb"))
    out = (
        tok.select(
            "doc_id",
            F.size(token_shingle_hashes(F.col("tb"), k=3)).alias("n_sh"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.n_sh for r in out] == [0, 0, 1, 0]
    str_out = (
        df.select("doc_id", F.size(shingles(k=3)).alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.n for r in str_out] == [0, 0, 1, 0]


def test_winnowing_short_document_runs(spark):
    """q101 over a frame containing sub-k docs completes with 0 fingerprints."""
    from kinesis_logs_reader_spark.functions.text import (
        token_base_hashes,
        token_shingle_hashes,
    )

    df = spark.createDataFrame([(1, "a"), (2, "a b c d e f g h")], "doc_id long, text string")
    tok = df.select("doc_id", token_base_hashes().alias("tb"))
    sh = tok.select(
        "doc_id", token_shingle_hashes(F.col("tb"), distinct=False).alias("sh")
    )
    rows = sh.select("doc_id", F.size("sh").alias("n")).orderBy("doc_id").collect()
    assert rows[0].n == 0 and rows[1].n == 6


def test_kmeans_index_persists_and_reloads(spark, tmp_path):
    """Fit-once semantics: second call loads identical centroids from the
    parquet side table (no retraining), and query results match."""
    import numpy as np

    from kinesis_logs_reader_spark.operators.similarity import (
        _KMEANS_CACHE,
        _corpus_fingerprint,
        _kmeans_index_path,
        get_or_fit_kmeans,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    key = f"testidx_{tmp_path.name}"
    cold = get_or_fit_kmeans(emb, key, n_clusters=8, n_iter=2)
    import os

    # The on-disk path folds in a corpus fingerprint so a regenerated
    # embeddings table retrains instead of reusing stale centroids.
    fp = _corpus_fingerprint(emb)
    assert os.path.exists(_kmeans_index_path(f"{key}_{fp}", 8, 2))
    _KMEANS_CACHE.clear()
    warm = get_or_fit_kmeans(emb, key, n_clusters=8, n_iter=2)
    assert np.array_equal(cold, warm)
