"""Session-scoped LRU cache of persisted DataFrames.

The `_klrs_*` session caches hold ONE persisted corpus-derived frame
per (sf_dir, ...) key. The original evict-ALL-on-miss policy thrashed
any workload alternating two corpora (the test suite constantly flips
between tmp_path fixtures and SF_DIR): every switch unpersisted and
recomputed the full corpus pass (ADVICE r10). A small LRU — the same
capped-eviction pattern as pq_encode's broadcast cache
(similarity.py) — keeps the handful of live corpora pinned while
still bounding executor memory.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CAPACITY = 3


def lru_persisted(
    spark: SparkSession,
    cache_name: str,
    key,
    build: Callable[[], DataFrame],
    capacity: int = DEFAULT_CAPACITY,
) -> DataFrame:
    """Return the persisted frame for `key`, building it on miss.

    Keeps at most `capacity` entries per cache; the least-recently-USED
    entry is unpersisted on overflow (never the one just requested).
    The cache lives on the SparkSession object so it dies with the
    session — no cross-session leakage.
    """
    cache: OrderedDict = spark.__dict__.setdefault(cache_name, OrderedDict())
    if key in cache:
        cache.move_to_end(key)
        return cache[key]
    while len(cache) >= capacity:
        _, stale = cache.popitem(last=False)
        stale.unpersist()
    df = build().persist()
    cache[key] = df
    return df


def corpus_key(sf_dir: str, table: str) -> tuple:
    """Content-fingerprint cache key for a corpus-derived frame:
    (abspath, mtime_ns, size) of the table file the frame derives
    from. The `_klrs_*` caches hold DATA (persisted frames / collected
    batches), not just plans, so a bare sf_dir key silently serves
    stale results after a table rewrite (ADVICE r12 on q119's query
    batch — this is the same fix applied to every corpus-keyed data
    cache). Loud on an unstatable path, never a silent stale hit; a
    rewrite simply misses (the superseded entry ages out through each
    site's existing eviction policy).
    """
    import os

    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    return (os.path.abspath(src), st.st_mtime_ns, st.st_size)
