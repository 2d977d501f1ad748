"""Generate-stage helpers: explode without the inferred-filter tax.

THE TRAP (measured, r11): for a non-outer ``explode``/``posexplode``,
Catalyst's ``InferFiltersFromGenerate`` adds ``size(e) > 0 AND
isnotnull(e)`` on the generator input, and ``PushDownPredicates`` then
pushes that filter below the projections that BUILT the array —
substituting the whole construction expression into the filter. For an
array built by stacked computed projections (the token-hash → shingle
chain), the substituted filter evaluates ``element_at(<inner
transform>, i)`` INSIDE the outer lambda, re-running the inner
array build once per element: O(n²) work per row where the query
wrote O(n). On q162's eval side this turned 2,600 shingle hashes into
~180k md5 evaluations: explode 1.35 s vs 0.10 s for the same rows at
sf0.1 (13x), physical-plan md5 count 11 vs 1.

THE FIX: ``explode_outer`` infers no filter (an empty/null array must
legitimately produce a null row), so generate first and drop the null
rows AFTER the generate, where the filter touches only the generated
column. Equivalent to ``explode`` iff the array contains no null
ELEMENTS (ours never do: ``split`` tokens, md5-derived hashes, and
integer shingle hashes are non-null by construction) — ``explode``
keeps null elements while this drops them, so don't use these helpers
over arrays that can hold nulls.

An alternative barrier is persisting the array frame (``.cache()`` —
what q89 does, measured 4.4 → 1.0 s at r7 before the mechanism was
identified); these helpers are the zero-memory form for single-use
arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonempty(
    df: DataFrame, col: Column, alias: str, *keep: str | Column
) -> DataFrame:
    """``df.select(*keep, explode(col))`` without the inferred-filter
    re-inline: generate with ``explode_outer``, then drop the null
    rows the outer form emits for empty/null arrays. Identical rows to
    ``explode`` for arrays with no null elements."""
    return df.select(*keep, F.explode_outer(col).alias(alias)).filter(
        F.col(alias).isNotNull()
    )


def posexplode_nonempty(
    df: DataFrame, col: Column, pos_alias: str, val_alias: str, *keep: str | Column
) -> DataFrame:
    """``posexplode`` twin of :func:`explode_nonempty`."""
    return df.select(
        *keep, F.posexplode_outer(col).alias(pos_alias, val_alias)
    ).filter(F.col(val_alias).isNotNull())
