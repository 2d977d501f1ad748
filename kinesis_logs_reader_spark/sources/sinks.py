"""Sinks: reference-parity TSV writer (A3) and helpers.

The reference prints sorted-column, tab-separated rows with a header
(reference __main__.py:15-21). ``write_tsv`` reproduces that contract
distributed: every part file carries the header and sorted columns;
``tsv_string`` collects a small result into one in-memory TSV string
for golden-byte comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sorted_columns(df: DataFrame) -> DataFrame:
    """R12 (reference __main__.py:15): project columns in sorted order."""
    return df.select(*sorted(df.columns))


def write_tsv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """A3: header + tab-separated values; sorted column order."""
    out = sorted_columns(df)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("emptyValue", "")
        .csv(path)
    )


def tsv_string(df: DataFrame, limit: int | None = None) -> str:
    """Driver-side TSV render for golden tests (small results only)."""
    out = sorted_columns(df)
    rows = out.collect() if limit is None else out.take(limit)
    header = "\t".join(out.columns)
    body = [
        "\t".join("" if v is None else str(v) for v in row) for row in rows
    ]
    return "\n".join([header, *body])
