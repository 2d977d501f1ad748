"""Central query registry: name -> callable(spark, sf_dir) -> DataFrame.

The driver contract (__spark_entry__.py) exposes ``queries()`` and
``oracle_sql()``; both are assembled here so each operator module stays
self-contained. Keys without an oracle entry get the driver's weaker
rows-only check (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis_logs_reader_spark.operators import relational
from kinesis_logs_reader_spark.oracle import ORACLE

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect(module) -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for name in dir(module):
        if name.startswith("q") and name[1:3].isdigit():
            out[name] = getattr(module, name)
    return out


def all_queries() -> dict[str, QueryFn]:
    queries: dict[str, QueryFn] = {}
    queries.update(_collect(relational))
    try:
        from kinesis_logs_reader_spark.streaming import batch_windows

        queries.update(_collect(batch_windows))
    except ImportError:
        pass
    for mod_name in (
        "analytics",
        "preprocess",
        "events",
        "sqlsurface",
        "pipeline",
        "curation",
        "dedup",
        "similarity",
        "textstats",
        "multimodal",
        "udfs",
        "asof",
    ):
        try:
            import importlib

            mod = importlib.import_module(
                f"kinesis_logs_reader_spark.operators.{mod_name}"
            )
            queries.update(_collect(mod))
        except ImportError:
            pass
    return queries


def all_oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
