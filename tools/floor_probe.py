"""Decompose and A/B the fixed per-job floor (VERDICT r14 item 2).

The sf0.1 bench is floor-bound: 228 queries x ~43-57 ms of fixed
per-job cost (py4j round trips + QueryExecution re-plan + DAG schedule
+ task launch + noop commit) is ~10-13 s of the ~90 s total, and the
8-core/32-core suite ratio of ~1.08 proves the cores have almost
nothing to divide. This probe answers two questions the bench line
cannot:

1. WHERE the floor goes — timed sub-steps of one 1-row noop job
   (py4j round trip alone, plan-only, full save; plus an RDD count
   to split SQL machinery from raw scheduling), and the per-phase
   QueryExecution tracker readout for a few real queries (how much
   of each timed save is driver-side re-optimization).
2. WHICH session conf moves it — a fresh session per candidate conf,
   best/mean of N 1-row noop saves, vs the bench profile baseline.

Usage: python tools/floor_probe.py [--decompose | --confs]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_PROFILE = {
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.sql.adaptive.enabled": "false",
    "spark.ui.enabled": "false",
    "spark.sql.ui.retainedExecutions": "8",
}


def build(extra: dict[str, str] | None = None):
    from kinesis_logs_reader_spark.session import build_session

    conf = dict(BENCH_PROFILE)
    conf.update(extra or {})
    spark = build_session(
        app_name="floor_probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=8,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe(spark, n: int = 40) -> tuple[float, float]:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        noop(spark.range(1))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, statistics.mean(ts) * 1e3


def decompose() -> None:
    spark = build()
    for _ in range(10):
        noop(spark.range(1))

    def best(f, n=40):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, statistics.mean(ts) * 1e3

    jvm_rt = best(lambda: spark._jsparkSession.version(), 200)
    df = spark.range(1)
    plan_only = best(
        lambda: spark.range(1)._jdf.queryExecution().executedPlan()
    )
    sc = spark.sparkContext
    rdd_job = best(lambda: sc.parallelize([1], 1).count())
    reused_df_save = best(lambda: noop(df))
    fresh_df_save = best(lambda: noop(spark.range(1)))
    collect_1row = best(lambda: spark.range(1).collect())
    print(f"py4j round-trip          best {jvm_rt[0]:7.2f}  mean {jvm_rt[1]:7.2f} ms")
    print(f"fresh QE plan-only       best {plan_only[0]:7.2f}  mean {plan_only[1]:7.2f} ms")
    print(f"rdd 1-task count         best {rdd_job[0]:7.2f}  mean {rdd_job[1]:7.2f} ms")
    print(f"noop save (reused df)    best {reused_df_save[0]:7.2f}  mean {reused_df_save[1]:7.2f} ms")
    print(f"noop save (fresh df)     best {fresh_df_save[0]:7.2f}  mean {fresh_df_save[1]:7.2f} ms")
    print(f"collect 1 row            best {collect_1row[0]:7.2f}  mean {collect_1row[1]:7.2f} ms")

    # Phase breakdown of real queries: how much of a timed save is
    # driver-side analysis/optimization/planning (re-paid EVERY save —
    # DataFrameWriter wraps the plan in a fresh QueryExecution).
    from kinesis_logs_reader_spark.registry import all_queries

    qs = all_queries()
    for name in (
        "q13_tpch_q1",
        "q05_join_inner",
        "q200_phash_admission",
        "q131c_table_profile_kmv",
        "q209_waiting_suppliers",
    ):
        df = qs[name](spark, SF_DIR)
        noop(df)  # warm
        t0 = time.perf_counter()
        noop(df)
        total_ms = (time.perf_counter() - t0) * 1e3
        jdf = df._jdf
        t0 = time.perf_counter()
        qe = jdf.sparkSession().sessionState().executePlan(
            jdf.queryExecution().logical(),
            jdf.queryExecution().mode(),
        )
        qe.executedPlan()
        replan_ms = (time.perf_counter() - t0) * 1e3
        print(f"{name:28s} save {total_ms:7.1f} ms   fresh-QE replan {replan_ms:6.1f} ms")
    spark.stop()


CANDIDATES: list[tuple[str, dict[str, str]]] = [
    ("baseline(bench profile)", {}),
    ("consoleProgress=off", {"spark.ui.showConsoleProgress": "false"}),
    ("locality.wait=0", {"spark.locality.wait": "0"}),
    ("kryo", {"spark.serializer": "org.apache.spark.serializer.KryoSerializer"}),
    ("constraintProp=off", {"spark.sql.constraintPropagation.enabled": "false"}),
    ("liveUpdate=-1", {"spark.ui.liveUpdate.period": "-1"}),
    ("retainedJobs=8", {
        "spark.ui.retainedJobs": "8",
        "spark.ui.retainedStages": "8",
        "spark.ui.retainedTasks": "100",
    }),
    ("codegen.hugeMethodLimit", {}),  # placeholder: keep list stable
    ("combo", {
        "spark.ui.showConsoleProgress": "false",
        "spark.locality.wait": "0",
        "spark.ui.liveUpdate.period": "-1",
        "spark.ui.retainedJobs": "8",
        "spark.ui.retainedStages": "8",
        "spark.ui.retainedTasks": "100",
    }),
]


def confs() -> None:
    for label, extra in CANDIDATES:
        spark = build(extra)
        for _ in range(10):
            noop(spark.range(1))
        b, m = probe(spark)
        print(f"{label:28s} best {b:6.2f}  mean {m:6.2f} ms", flush=True)
        spark.stop()
        time.sleep(2)


COMBO = {
    "spark.ui.showConsoleProgress": "false",
    "spark.locality.wait": "0",
    "spark.ui.liveUpdate.period": "-1",
    "spark.ui.retainedJobs": "8",
    "spark.ui.retainedStages": "8",
    "spark.ui.retainedTasks": "100",
}


def interleave(reps: int = 4) -> None:
    """ABAB... alternation of fresh sessions: the --confs sweep showed
    a monotone downward drift (a placeholder no-op candidate also read
    -12 ms vs the first-run baseline), so per-candidate attribution
    needs arms interleaved across the drift."""
    arms = {"base": {}, "combo": COMBO}
    results: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(reps):
        for label, extra in arms.items():
            spark = build(extra)
            for _ in range(10):
                noop(spark.range(1))
            b, m = probe(spark, 30)
            results[label].append(b)
            print(f"{label:6s} best {b:6.2f}  mean {m:6.2f} ms", flush=True)
            spark.stop()
    for label, bs in results.items():
        print(f"{label}: min {min(bs):.2f}  median {statistics.median(bs):.2f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--decompose", action="store_true")
    ap.add_argument("--confs", action="store_true")
    ap.add_argument("--interleave", action="store_true")
    a = ap.parse_args()
    if a.decompose:
        decompose()
    if a.confs:
        confs()
    if a.interleave:
        interleave()
