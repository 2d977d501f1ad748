"""Interleaved same-session A/B of the spread_scan optimization.

The VM's minute-scale load bursts make cross-run bench comparisons lie
in both directions (PERF.md r9; re-confirmed r14). The only trustworthy
verdict is alternating executions of BOTH plan forms inside ONE
session: for each query, construct the plan with spread_scan disabled
(SPARK_GRAFT_NO_SPREAD=1 at construction time) and enabled, then run
A,B,A,B,... and compare best-of-N.

Usage: python tools/ab_probe.py [--runs 6] q17_global_agg ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SCALE_MODE", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kinesis_logs_reader_spark.registry import all_queries
    from kinesis_logs_reader_spark.session import build_session

    spark = build_session(
        app_name="ab_probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for _ in range(3):
        spark.range(1).write.format("noop").mode("overwrite").save()

    def detach_session_caches() -> set[str]:
        """Drop every _klrs_* DATA cache from the session (ADVICE r14,
        medium): the OFF arm is constructed first, so any session-cached
        subtree (pairs, doc tokens, lru_persisted frames...) would be
        built spread-free and silently REUSED by the ON arm — for
        cache-backed queries the probe would then time identical plans
        on the heavy subtree and bias keep/revert toward OFF/neutral.

        Detach WITHOUT unpersisting: an arm constructed earlier keeps
        its persisted subtree alive through its own plan reference, and
        the next arm rebuilds its own flavor. Memory is bounded by the
        probe's short life. _klrs_table_cache stays (resolved scan
        plans only — spread_scan is applied by callers, never inside
        load_table) and so does the configure_runtime latch. Returns
        the detached names so cache-backed queries are visible in the
        probe output."""
        detached = set()
        for k in list(spark.__dict__):
            if k.startswith("_klrs_") and k not in (
                "_klrs_runtime_configured",
                "_klrs_table_cache",
            ):
                del spark.__dict__[k]
                detached.add(k)
        return detached

    for name in args.queries:
        detach_session_caches()
        os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
        df_off = queries[name](spark, args.sf)
        del os.environ["SPARK_GRAFT_NO_SPREAD"]
        cache_backed = detach_session_caches()
        df_on = queries[name](spark, args.sf)
        if cache_backed:
            print(f"AB {name}: cache-backed via {sorted(cache_backed)}", flush=True)
        best = {"off": float("inf"), "on": float("inf")}
        # warm both forms once (cold codegen must not bias either arm)
        for tag, df in (("off", df_off), ("on", df_on)):
            df.write.format("noop").mode("overwrite").save()
        for _ in range(args.runs):
            for tag, df in (("off", df_off), ("on", df_on)):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best[tag] = min(best[tag], time.perf_counter() - t0)
        verdict = "SPREAD-WINS" if best["on"] < best["off"] else "OFF-WINS"
        print(
            f"AB {name}: off {best['off']:.3f}s  on {best['on']:.3f}s  "
            f"{verdict} ({100 * (best['on'] - best['off']) / best['off']:+.0f}%)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
