"""Text-processing column expressions (all JVM-side, codegen-friendly).

Shared by the dedup / text-analysis operators. Everything here is a
Catalyst expression — no Python UDFs — so the hot path of a 100 TB
document pipeline stays inside whole-stage codegen. Shingling and
MinHash are per-row array computations (no explode, no shuffle) until
the final candidate-pair join.

MinHash uses md5 as the hash family (``md5(j || ':' || shingle)``):
md5 is bit-identical across engines, which makes the signatures
oracle-checkable in DuckDB — unlike engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str = "text") -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def n_tokens(text: Column | str = "text") -> Column:
    return F.size(tokens(text))


def shingles(text: Column | str = "text", k: int = 3) -> Column:
    """k-token shingles as an array<string> (1 row -> 1 array, no explode).

    NOTE: this inlines the token split into every shingle element (the
    slice lambda re-evaluates it — O(n^2) characters per document,
    measured 3.5x on q45). In any plan with more than a handful of
    shingles per row, project :func:`tokens` into its own column first
    and use :func:`shingles_from_tokens`.
    """
    return shingles_from_tokens(tokens(text), k)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles over a MATERIALIZED token-array column."""
    n_sh = F.size(toks) - F.lit(k - 1)
    # < k tokens -> empty (sequence(1,0) is DESCENDING [1,0]; slice at 0 faults)
    return F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# MinHash affine hash family over a 61-bit md5-derived base integer:
#   base = int(md5(s)[:15], 16) mod P;  h_j = (A_j * base + B_j) mod P
# P = 2^31 - 1 keeps every intermediate < 2^62, so the arithmetic is
# exact int64 in both Spark and DuckDB (DuckDB errors on overflow, so
# staying in range is correctness, not just portability).
MINHASH_P = 2_147_483_647
MINHASH_A = [1_103_515_245, 1_299_709, 7_368_787, 104_729, 179_424_673, 15_485_863, 32_452_843, 49_979_687]
MINHASH_B = [12_345, 987_654_321, 11_939, 7_919, 104_659, 15_487_469, 982_451_653, 86_028_121]


def _base_hash(s: Column) -> Column:
    """Deterministic 61-bit integer hash of a string via md5 (both engines)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MINHASH_P


def base_hashes(shingle_col: Column) -> Column:
    """Array of 61-bit integer hashes, one md5 per distinct shingle.

    Materialize this as its own column *before* fanning out to the
    affine mins: higher-order lambdas defeat Catalyst's subexpression
    elimination, so referencing a repeated ``transform(.., md5)`` tree
    from every signature column would recompute the md5s 8x.
    """
    return F.transform(shingle_col, _base_hash)


# Shingle hashes without shingle strings: hash each TOKEN once (md5),
# then combine 3 consecutive token hashes linearly mod P. Each product
# is reduced mod P before the sum so every intermediate stays < 2^62
# (DuckDB errors on int64 overflow). ~3x fewer bytes through md5 and
# zero string concatenation vs hashing "tok1 tok2 tok3" strings.
SHINGLE_C = [912_367_891, 1_500_450_271, 2_038_074_743]


def token_base_hashes(text: Column | str = "text") -> Column:
    """array<bigint>: one md5-derived 31-bit hash per token.

    MUST be materialized as its own projection before feeding
    :func:`token_shingle_hashes` — passing the raw expression tree
    would inline the whole array build into every ``element_at``,
    turning n md5s into O(n^2).
    """
    return F.transform(tokens(text), _base_hash)


def token_shingle_hashes(tb_col: Column, k: int = 3, distinct: bool = True) -> Column:
    """array<bigint> of k-token shingle hashes over a *materialized*
    token-hash array column (see token_base_hashes). ``distinct=False``
    preserves the positional sequence (winnowing needs it).

    Documents with fewer than ``k`` tokens yield an EMPTY array. Without
    the guard, ``sequence(1, 0)`` produces a *descending* ``[1, 0]``
    (Spark defaults the step to -1 when start > stop) and ``element_at``
    faults on index 0; DuckDB's ``generate_series(1, 0)`` is empty, so
    the guard also keeps the engines aligned.
    """
    n_sh = F.size(tb_col) - F.lit(k - 1)
    combined = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: (
                (F.element_at(tb_col, i) * F.lit(SHINGLE_C[0])) % F.lit(MINHASH_P)
                + (F.element_at(tb_col, i + 1) * F.lit(SHINGLE_C[1])) % F.lit(MINHASH_P)
                + (F.element_at(tb_col, i + 2) * F.lit(SHINGLE_C[2])) % F.lit(MINHASH_P)
            )
            % F.lit(MINHASH_P),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(combined) if distinct else combined


def minhash_signature(base_col: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash signature over precomputed base hashes (cheap int math)."""
    return [
        F.array_min(
            F.transform(
                base_col,
                lambda x: (x * F.lit(MINHASH_A[j]) + F.lit(MINHASH_B[j]))
                % F.lit(MINHASH_P),
            )
        ).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def banded_digest(cols: list[Column]) -> Column:
    """md5 over '|'-joined signature coordinates with NULL-PROPAGATING
    ``concat`` (matching DuckDB's ``||``), NOT ``concat_ws``: a document
    with fewer tokens than the shingle width has an EMPTY base set and
    a NULL signature, and concat_ws would skip the NULLs and give every
    such document the identical ``md5('|')`` digest — silently pairing
    ALL short docs with each other in every band (a quadratic blowup at
    100 TB and a divergence from the SQL oracle, whose NULL digest
    never equi-joins). Found by tests/test_hash_contract_fuzz.py; NULL
    band digests drop out of the band join in both engines identically.

    This is THE band-digest recipe (hash-contract c2) — every band
    construction (band_hashes, q155's multi-r sweep, the persisted
    corpus index) must go through it so a recipe change stays atomic.
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(c.cast("string"))
    return F.md5(F.concat(*parts))


def band_hashes(num_hashes: int = 8, rows_per_band: int = 2) -> list[Column]:
    """LSH band digests over an already-computed mh0..mhN signature
    (see :func:`banded_digest` for the NULL contract)."""
    bands = []
    for b in range(num_hashes // rows_per_band):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(banded_digest(cols).alias(f"band{b}"))
    return bands


def stopword_count(text: Column | str = "text", stopwords: tuple[str, ...] = ("the", "a")) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))
