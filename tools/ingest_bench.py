"""Ingest-path throughput: engine vs reference-architecture loop.

The reference's ceiling is architectural: one thread, one process,
serial gunzip -> json -> filter -> flatten per record (BASELINE.md;
reference kinesis_logs_reader.py:81,97-104). This benchmark feeds the
IDENTICAL envelope blobs to (a) a faithful single-threaded Python loop
doing the reference's per-record work (no network, so it's an upper
bound on the reference's possible throughput) and (b) the engine's
``read_cwl_batch`` pipeline on local[32].

Prints one JSON line with rows/s for both and the speedup.

Usage: python tools/ingest_bench.py [n_shards] [files_per_shard] [events_per_file]
"""

from __future__ import annotations

import gzip
import io
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BENCH_DIR = "/tmp/spark_graft_ingest_bench"


def build_fixtures(n_shards: int, files_per_shard: int, events_per_file: int) -> int:
    shutil.rmtree(BENCH_DIR, ignore_errors=True)
    n = 0
    for s in range(n_shards):
        shard = os.path.join(BENCH_DIR, f"shard{s:02d}")
        os.makedirs(shard)
        for f in range(files_per_shard):
            events = []
            for e in range(events_per_file):
                i = (s * files_per_shard + f) * events_per_file + e
                events.append(
                    {
                        "id": str(i),
                        "timestamp": 1700000000000 + i,
                        "message": "-",
                        "extractedFields": {
                            "version": "2",
                            "account_id": "123456789010",
                            "interface_id": f"eni-{i % 97:07x}",
                            "srcaddr": f"10.{(i >> 16) % 256}.{(i >> 8) % 256}.{i % 256}",
                            "dstaddr": "198.51.100.1",
                            "srcport": str(1024 + (i % 50000)),
                            "dstport": "443",
                            "protocol": "6",
                            "packets": str(i % 1000),
                            "bytes": str((i % 1000) * 840),
                            "start": str(1700000000 + i),
                            "end": str(1700000060 + i),
                            "action": "ACCEPT" if i % 7 else "REJECT",
                            "log_status": "OK",
                        },
                    }
                )
            blob = {"messageType": "DATA_MESSAGE", "logEvents": events}
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(json.dumps(blob).encode())
            with open(os.path.join(shard, f"p{f:04d}.gz"), "wb") as out:
                out.write(buf.getvalue())
            n += events_per_file
    return n


def reference_style_loop() -> tuple[int, float]:
    """The reference's per-record work, single thread (its architecture):
    gunzip -> json.loads -> drop CONTROL -> flatten -> project
    (kinesis_logs_reader.py:87-95), over every file of every shard."""
    t0 = time.perf_counter()
    rows = 0
    for shard in sorted(os.listdir(BENCH_DIR)):
        sdir = os.path.join(BENCH_DIR, shard)
        for fname in sorted(os.listdir(sdir)):
            with open(os.path.join(sdir, fname), "rb") as fobj:
                envelope = json.loads(gzip.decompress(fobj.read()).decode("utf-8"))
            if envelope["messageType"] != "DATA_MESSAGE":
                continue
            for event in envelope["logEvents"]:
                fields = event["extractedFields"]  # the logical row
                rows += 1
    return rows, time.perf_counter() - t0


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    files_per_shard = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    events_per_file = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    total = build_fixtures(n_shards, files_per_shard, events_per_file)

    ref_rows, ref_s = reference_style_loop()

    from kinesis_logs_reader_spark.session import build_session
    from kinesis_logs_reader_spark.sources.envelope import read_cwl_batch

    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    read_cwl_batch(spark, BENCH_DIR, typed=True).count()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        got = read_cwl_batch(spark, BENCH_DIR, typed=True).count()
        best = min(best, time.perf_counter() - t0)
    assert got == ref_rows == total, (got, ref_rows, total)

    print(
        json.dumps(
            {
                "rows": total,
                "reference_single_thread_rows_per_s": round(ref_rows / ref_s),
                "engine_rows_per_s": round(got / best),
                "speedup": round((ref_s / best), 1),
                "reference_s": round(ref_s, 2),
                "engine_s": round(best, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
