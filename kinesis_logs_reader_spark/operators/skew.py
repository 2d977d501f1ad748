"""Skew-handling primitives for hot keys at scale.

At 100 TB a handful of hot keys (one viral user_id, one dominant
event_type) can pin a single reducer while 999 executors idle. Two
mitigations, both pure DataFrame:

- ``salted_agg``: classic two-phase aggregation — explode each key into
  ``n_salts`` sub-keys, partially aggregate per (key, salt), then
  aggregate the partials. The hot key's work spreads across n_salts
  reducers; cost is one extra (tiny) shuffle over partials. Only
  algebraic aggregates (sum/count/min/max) can be salted this way.
- AQE skew-join splitting is enabled session-wide (session.py) and
  covers the join case without code changes.

``dropDuplicates`` / exact dedup skew: group by md5(key) instead of the
raw key (operators/dedup.py) so the shuffle keys are uniform 16-byte
digests — hash distribution is uniform even when key *values* are hot,
though identical values still land together (that's the semantics);
salting is the answer when the same value is hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'}. Example::

        salted_agg(events, 'event_type',
                   {'cnt': ('event_id', 'count'), 'total': ('value', 'sum')})
    """
    salt = (F.abs(F.xxhash64(*df.columns)) % n_salts).alias("_salt")
    phase1_exprs = []
    phase2_exprs = []
    for out, (col, fn) in aggs.items():
        part = f"_p_{out}"
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(part))
            phase2_exprs.append(F.min(part).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(part))
            phase2_exprs.append(F.max(part).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate cannot be salted: {fn}")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*phase1_exprs)
    return partial.groupBy(key).agg(*phase2_exprs)


def repartition_for_join(df: DataFrame, key: str | Column, n: int) -> DataFrame:
    """Pre-shuffle on the join key so repeated joins against the same
    key reuse one exchange (Catalyst reuses compatible output
    partitioning across stages)."""
    return df.repartition(n, key)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: salt the (skewed) fact side with a
    deterministic per-row salt, replicate every dim row across all
    ``n_salts`` values, join on (key, salt).

    The hot key's fact rows spread over n_salts reducers instead of
    pinning one; the dim side grows n_salts-fold, which is the explicit
    trade — use when the dim is broadcast-too-big but still orders of
    magnitude smaller than the fact (else AQE skew splitting, enabled
    session-wide, is the zero-code path). Salt is md5-derived, not
    rand(): rerunning the plan gives identical placement, so the join
    is retry/speculation-safe.
    """
    salt_f = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 17, 8), 16, 10)
        .cast("bigint") % n_salts
    ).cast("int")
    fact_s = fact.withColumn("_salt", salt_f)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = fact_s.join(dim_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
