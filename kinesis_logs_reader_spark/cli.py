"""CLI with the reference's exact flags, printing TSV to stdout.

Mirrors reference __main__.py:26-57: positional ``stream_name``,
``--start-time``, ``--count`` (0 = unlimited), ``--time-format``
(default ``%Y-%m-%d %H:%M:%S``). Adds ``--path`` for hermetic replay of
envelope fixture directories (no live AWS in CI — SURVEY.md §7.3).

Output contract (reference __main__.py:13-23): header = sorted column
names (R12), then tab-joined values (R14), stopping after ``--count``
rows (R13). Sorting column names replaces the reference's first-row
peek: the schema is known up front in Spark, so no peek/reattach
(R11) is needed.
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from itertools import islice

from kinesis_logs_reader_spark.reader import KinesisLogsReader
from kinesis_logs_reader_spark.session import build_session


def print_stream(reader: KinesisLogsReader, stop_after: int = 0, outfile=None) -> int:
    """TSV printer mirroring reference __main__.py:10-23."""
    outfile = outfile or sys.stdout
    df = reader.to_df()
    if reader._typed:
        header = sorted(df.columns)  # R12: __main__.py:15
        rows = (r.asDict() for r in df.toLocalIterator())
    else:
        it = (dict(r["fields"]) for r in df.toLocalIterator())
        try:
            first = next(it)
        except StopIteration:
            return 0
        header = sorted(first.keys())
        from itertools import chain

        rows = chain([first], it)
    print(*header, sep="\t", file=outfile)
    n = 0
    limit = islice(rows, stop_after) if stop_after else rows
    for item in limit:  # R13/R14: __main__.py:20-23
        print(*(item.get(k) for k in header), sep="\t", file=outfile)
        n += 1
    return n


def main(argv: list[str] | None = None) -> None:
    # Flags mirror reference __main__.py:29-50.
    parser = argparse.ArgumentParser(prog="kinesis_logs_reader_spark")
    parser.add_argument("stream_name", help="Kinesis stream name, or ignored with --path")
    parser.add_argument(
        "--start-time",
        default=None,
        help="read from this time instead of LATEST (reference __main__.py:34-37)",
    )
    parser.add_argument(
        "--count",
        type=int,
        default=0,
        help="stop after this many rows; 0 = unlimited (reference __main__.py:38-43)",
    )
    parser.add_argument(
        "--time-format",
        default="%Y-%m-%d %H:%M:%S",
        help="strptime format for --start-time (reference __main__.py:44-49)",
    )
    parser.add_argument("--path", default=None, help="replay a fixture dir instead of Kinesis")
    parser.add_argument("--typed", action="store_true", help="cast to the VPC flow-log schema")
    args = parser.parse_args(argv)

    start_time = None
    if args.start_time is not None:
        # Reference __main__.py:52-55.
        start_time = datetime.strptime(args.start_time, args.time_format)

    spark = build_session(master="local[*]")
    reader = KinesisLogsReader(
        args.stream_name, start_time, spark=spark, path=args.path, typed=args.typed
    )
    print_stream(reader, stop_after=args.count)


if __name__ == "__main__":
    main()
