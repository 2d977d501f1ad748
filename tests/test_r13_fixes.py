"""Round-13 regression tests for the r12 ADVICE fixes.

Each test pins the SEMANTIC the fix bought, not the implementation:
q203 NULL-text classification, q119 cache invalidation on corpus
rewrite, and the sink stores' one-level batch-partition probe.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("r13-fixes")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _write_docs(path, docs):
    texts = [d[1] for d in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": texts,
                "source": [d[2] for d in docs],
                "lang": ["en"] * len(docs),
                "n_chars": [len(t) if t is not None else 0 for t in texts],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("source", pa.string()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        os.path.join(path, "documents.parquet"),
    )


def test_q203_null_text_rows_classify_by_presence(spark, tmp_path):
    """ADVICE r12 (dedup.py q203): a NULL-text document present in BOTH
    snapshots is unchanged, not 'added'; NULL v1 text must not shadow a
    genuine 'removed'. Digests are md5(coalesce(text, '')) so digest
    NULLness means key absence, never NULL-text presence."""
    from kinesis_logs_reader_spark.operators.dedup import q203_snapshot_delta

    docs = [
        # key 0: NULL text in both snapshots -> unchanged
        (0, None, "a"),
        (1, None, "a"),
        # key 1: NULL -> real text: changed (not 'added')
        (2, None, "a"),
        (3, "now has text", "a"),
        # key 2: real text -> NULL: changed (not 'removed')
        (4, "had text", "b"),
        (5, None, "b"),
        # key 3: NULL text, v0 only -> removed
        (6, None, "b"),
    ]
    _write_docs(str(tmp_path), docs)
    rows = {
        r.source: r for r in q203_snapshot_delta(spark, str(tmp_path)).collect()
    }
    a, b = rows["a"], rows["b"]
    assert (a.n_added, a.n_removed, a.n_changed, a.n_unchanged) == (0, 0, 1, 1)
    assert (b.n_added, b.n_removed, b.n_changed, b.n_unchanged) == (0, 1, 1, 0)


def _write_embeddings(path, rows):
    pq.write_table(
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "label": [0] * len(rows),
                "embedding": [r[1] for r in rows],
            },
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("label", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                ]
            ),
        ),
        os.path.join(path, "embeddings.parquet"),
    )


def test_q119_query_cache_invalidates_on_corpus_rewrite(spark, tmp_path):
    """ADVICE r12 (similarity.py q119): the driver-side query-vector
    cache is keyed by the embeddings file's content fingerprint
    (mtime_ns+size), so rewriting the table mid-session must serve the
    NEW query vectors, not the cached ones."""
    from kinesis_logs_reader_spark.operators.similarity import q119_knn_join

    # v1 corpus: query vec 0 is +x, candidates 10 (+x) and 11 (+y)
    _write_embeddings(
        str(tmp_path),
        [(0, [1.0, 0.0]), (10, [1.0, 0.0]), (11, [0.0, 1.0])],
    )
    first = q119_knn_join(spark, str(tmp_path)).collect()
    top1 = next(r for r in first if r.rn == 1)
    assert top1.vec_id == 10

    # rewrite: query vec 0 now +y — candidate 11 must win
    _write_embeddings(
        str(tmp_path),
        [(0, [0.0, 1.0]), (10, [1.0, 0.0]), (11, [0.0, 1.0])],
    )
    # force a distinct fingerprint even on coarse-mtime filesystems
    src = os.path.join(str(tmp_path), "embeddings.parquet")
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    second = q119_knn_join(spark, str(tmp_path)).collect()
    top1 = next(r for r in second if r.rn == 1)
    assert top1.vec_id == 11


def test_store_has_batches_probe(tmp_path):
    """ADVICE r12 (streaming/jobs.py): the cumulative-store probe reads
    ONE directory level — empty store, empty partition dir, and
    non-partition top-level files are all 'no batches'; a parquet file
    inside a batch_id=* dir is 'has batches'."""
    from kinesis_logs_reader_spark.streaming.jobs import _store_has_batches

    store = tmp_path / "store"
    assert not _store_has_batches(str(store))  # missing dir
    store.mkdir()
    assert not _store_has_batches(str(store))  # empty dir
    (store / "_SUCCESS").write_text("")  # non-partition top-level file
    assert not _store_has_batches(str(store))
    (store / "batch_id=0").mkdir()  # crashed write: dir, no parquet
    assert not _store_has_batches(str(store))
    (store / "batch_id=0" / "part-0.parquet").write_bytes(b"")
    assert _store_has_batches(str(store))
