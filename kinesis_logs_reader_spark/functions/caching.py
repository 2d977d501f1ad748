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
