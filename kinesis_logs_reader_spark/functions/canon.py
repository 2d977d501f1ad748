"""Canonical row serialization shared by the local parity gate
(tools/check_parity.py) and the driver-side canonical-row dump
(registry.export_queries, VERDICT r14 item 1).

One definition so the local mirror and the in-driver diagnostic can
never canonicalize differently — the whole point of the dump is to
diff the driver's bytes against the local gate's bytes.
"""

from __future__ import annotations

import hashlib
import math
import os
from datetime import date, datetime


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse IEEE signed zero: -0.0 vs 0.0 is not a diff
        # repr of float64 is exact round-trip; both engines produce float64
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive value hash over column-name-sorted cells."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x1f".join(canon_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def dump_canonical_rows(df, exported: str, sf_dir: str, dump_dir: str) -> None:
    """Collect a (small) result and leave a diffable canonical artifact.

    Written for the driver-red diagnosis loop: the file carries the
    Spark dtypes, the rows in returned order, the sorted canonical rows,
    and the order-insensitive hash — enough to tell apart a value
    divergence, an order divergence, and a type-canonicalization
    divergence without re-running anything. Hard-capped at 100k rows so
    a mis-gated call can never turn a query into a driver collect.
    """
    rows = df.limit(100_001).collect()
    if len(rows) > 100_000:
        return
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    returned = [
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    ]
    os.makedirs(dump_dir, exist_ok=True)
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(dump_dir, f"{exported}__{sf_tag}.txt")
    with open(path, "w") as f:
        f.write(f"# query: {exported}\n# sf_dir: {sf_dir}\n")
        f.write(f"# dtypes: {df.dtypes}\n")
        f.write(f"# n_rows: {len(rows)}\n")
        f.write(f"# hash: {table_hash(cols, rows)}\n")
        f.write("# --- rows (returned order, column-name-sorted cells) ---\n")
        for r in returned:
            f.write(r + "\n")
        f.write("# --- rows (sorted canonical) ---\n")
        for r in sorted(returned):
            f.write(r + "\n")
