"""Deterministic random-sign (Johnson-Lindenstrauss) projection matrix.

Pure hashlib — no pyspark imports — so both the Spark operator
(``operators/similarity.py::q135_jl_projection``) and the DuckDB oracle
(``oracle.py``) can derive the IDENTICAL +-1 matrix and embed it as
literals. Signs come from md5 parity of ``"{i}:{j}"``: reproducible on
any machine, no RNG state, no seed-ordering hazards — the same
md5-as-shared-hash-family trick the MinHash kernel uses
(functions/text.py).
"""

from __future__ import annotations

import hashlib

JL_IN_DIMS = 64  # embeddings table vector width (TESTDATA.md)
JL_OUT_DIMS = 8


def jl_sign(i: int, j: int) -> int:
    """+1 or -1 for input dim ``i`` -> output dim ``j``."""
    h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def sign_matrix() -> list[list[int]]:
    """[out_dim][in_dim] sign matrix."""
    return [
        [jl_sign(i, j) for i in range(JL_IN_DIMS)] for j in range(JL_OUT_DIMS)
    ]
