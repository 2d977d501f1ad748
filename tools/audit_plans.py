"""Optimizer-trap audit over every declared query's physical plan.

Two scans (r11, PERF.md "InferFiltersFromGenerate re-inline trap"):

1. **Inferred computed-array filters** — for a non-outer explode/
   posexplode, Catalyst infers ``size(e) > 0`` and pushes it below the
   projections that built the array, substituting the construction
   expression into the filter (O(n^2) for stacked HOF chains; 13x on
   q162's shingle stage before the fix). Fingerprint: a Filter node
   evaluating ``size()`` over transform/split/regexp_extract_all/CASE.
   Expected output after the r11 sweep: zero hits. Re-run after any
   Spark upgrade — the fix (functions/generate.py) is plan-pinned but
   new call sites regress silently. CAVEAT (ADVICE r11): subtrees
   behind lru_persisted show as InMemoryTableScan here, so a trapped
   explode INSIDE a cache-build lambda is invisible to this scan —
   the cache-build sites themselves must use explode_nonempty.

2. **Expression-reuse census** — md5/transform occurrence counts per
   executedPlan. High counts are usually legitimate (q174's bounded
   recursion unroll, two-sided pair joins over signature frames, the
   8-permutation MinHash transforms); a NEW entrant near the top of
   this list is the cue to check whether a frame needs the
   lru_persisted barrier.

3. **Single-partition data exchanges** (late-r13, the q21 class) — a
   PARTITION-BY-less window / global row_number plans ``Exchange
   SinglePartition`` over the full frame: one thread sorts everything
   (q21 read growth 5.71 at 10x before the rank.py rewrite).
   Fingerprint: an ``Exchange SinglePartition`` whose subtree reaches a
   FileScan with no Aggregate/Limit boundary in between. Aggregated
   frames (scalar crossJoin broadcasts, the rank kernel's
   #partitions-row offsets) are fine and not flagged. CAVEAT: like
   scan 1, subtrees behind lru_persisted show as InMemoryTableScan and
   are treated as a boundary — a global window over a persisted
   corpus-scale frame is invisible here (q152's documented ntile is
   exactly that; its scale path is q152b).

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

from pathlib import Path

# repo root from this script's location, not a hardcoded checkout path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# Scan-3 whitelist: queries whose global window is a MEASURED-negative
# rank-kernel candidate, with the rationale in their docstring. q110:
# the ranked frames are (doc_id, score) pairs where the one-thread sort
# is instant and the kernel's extra stages were pure floor (3-4x slower
# at every SF); its production path is q110b's per-retriever top-K.
SP_WHITELIST = {"q110_rrf_hybrid"}

_BOUNDARY = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|CollectLimit|"
    r"GlobalLimit|LocalLimit|TakeOrderedAndProject|WindowGroupLimit|"
    r"InMemoryTableScan|ReusedExchange"
)


def _depth(line: str) -> int:
    """Indentation depth in a Spark plan tree string."""
    return len(line) - len(line.lstrip(" :+-*("))


def _single_partition_data(plan: str) -> list[str]:
    """Scan 3 (the q21 class): ``Exchange SinglePartition`` nodes whose
    subtree reaches a FileScan with no aggregate/limit/cache boundary —
    i.e. the whole data frame is being funneled onto one thread."""
    hits: list[str] = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = _depth(line)
        for sub in lines[i + 1 :]:
            if sub.strip() and _depth(sub) <= d:
                break  # left the subtree
            if _BOUNDARY.search(sub):
                break  # aggregated / bounded / cached below: fine
            if "FileScan" in sub or "Scan parquet" in sub:
                hits.append(line.strip()[:120])
                break
    return hits


def main() -> None:
    from kinesis_logs_reader_spark.registry import all_queries
    from kinesis_logs_reader_spark.session import build_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    infer_hits: list[tuple[str, str]] = []
    sp_hits: list[tuple[str, str]] = []
    census: list[tuple[int, int, str]] = []
    errs: list[str] = []
    for name, fn in sorted(all_queries().items()):
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            errs.append(f"{name}: {type(exc).__name__}")
            continue
        for m in re.finditer(r"Filter \(*(.{0,400})", plan):
            frag = m.group(1)
            # The O(n^2) class: a filter evaluating size() over a
            # HOF-built array (transform / CASE-wrapped transform) —
            # each element re-runs the inner build. Pushed-down USER
            # predicates over scalar chains (q154's size(split())>=k,
            # inferred join-key not-nulls) are constant-factor-2 and
            # deliberately not flagged.
            if re.search(
                r"size\((transform|array_distinct\(transform|CASE WHEN)",
                frag,
            ):
                infer_hits.append((name, frag[:160]))
                break
        census.append((plan.count("md5"), plan.count("transform("), name))
        if name not in SP_WHITELIST:
            sp_hits.extend(
                (name, frag) for frag in _single_partition_data(plan)
            )

    print("== inferred computed-array filters (expect: none) ==")
    for name, frag in infer_hits:
        print(f"HIT {name}: {frag}")
    print(f"{len(infer_hits)} hits / {len(census)} plans / {len(errs)} errors")
    print("\n== single-partition exchanges over unaggregated scans (expect: none) ==")
    for name, frag in sp_hits:
        print(f"HIT {name}: {frag}")
    print(f"{len(sp_hits)} hits")
    print("\n== expression-reuse census (top 15 by md5 count) ==")
    for n_md5, n_tr, name in sorted(census, reverse=True)[:15]:
        print(f"md5={n_md5:3d} transform={n_tr:3d} {name}")
    spark.stop()
    if infer_hits or sp_hits:
        sys.exit(1)


if __name__ == "__main__":
    main()
