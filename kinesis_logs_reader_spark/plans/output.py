"""Two-mode presentation-order contract (VERDICT r3 item 9).

Row-level queries end with a deterministic presentation ORDER BY — the
same total-order contract the reference CLI's sorted TSV output gives
(reference kinesis_logs_reader/__main__.py:10-57). That global sort is
one range-partitioning exchange of the ENTIRE output: fine at sf0.1,
an anti-pattern at 100 TB where the output of a map-only projection
should ship straight from the scan partitions to the sink.

``presentation_order`` therefore has two modes:

- default (the hashed correctness path, the driver gate, parity tests):
  global ORDER BY — byte-stable total order, unchanged semantics;
- ``SPARK_GRAFT_SCALE_MODE=1``: per-partition SORT BY — each output
  partition is internally ordered and the range exchange disappears,
  which is the contract a range-partitioned parquet write (or any
  downstream merge-reader) actually needs at scale.

The correctness gate's value hash is order-insensitive, so both modes
hash identically; only the partition-stream layout differs. SCALE.md
records the measured delta per mode.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame


def scale_mode() -> bool:
    return bool(os.environ.get("SPARK_GRAFT_SCALE_MODE"))


def presentation_order(df: DataFrame, *cols: str | Column) -> DataFrame:
    if scale_mode():
        return df.sortWithinPartitions(*cols)
    return df.orderBy(*cols)
