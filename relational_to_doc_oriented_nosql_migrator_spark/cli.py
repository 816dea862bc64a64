"""Command-line entry point — the batch equivalent of the reference's
HTTP API (`POST /migration`, reference server/index.js:33-43): a SQL dump
(or a directory of parquet tables) plus an optional query log in, JSON
document collections out.

    python -m relational_to_doc_oriented_nosql_migrator_spark.cli \
        --dump northwind.sql --log queries.log --dialect mysql --out out/

Prints one JSON summary line: collections written, document counts, and
the output directory — the CLI twin of the reference's zip download
(server/WriteToFile.js:27-35).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="relational_to_doc_oriented_nosql_migrator_spark",
        description="Workload-driven relational -> document migration on "
        "Spark: SQL dump or parquet tables in, JSON collections out.",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dump", help="SQL dump file (MySQL/Postgres dialect)")
    src.add_argument(
        "--tables",
        help="directory of <table>.parquet inputs (TPC-H-style catalog)",
    )
    p.add_argument("--log", help="query log file for workload GAF/UAF stats")
    p.add_argument(
        "--dialect", default="mysql", choices=("mysql", "postgres"),
        help="query-log dialect (default mysql)",
    )
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument(
        "--zip", dest="zip_path",
        help="also pack the output directory into this zip (reference "
        "results/collections.zip parity)",
    )
    p.add_argument(
        "--single-file", action="store_true",
        help="one JSON array per collection (reference byte-parity mode; "
        "collects to the driver — small outputs only)",
    )
    p.add_argument(
        "--no-normalize-dates", action="store_true",
        help="keep raw date/timestamp values instead of the reference's "
        "yyyy-MM-dd local-time strings",
    )
    p.add_argument(
        "--master", default=None,
        help="Spark master override (default: local[$SPARK_GRAFT_CPUS])",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from relational_to_doc_oriented_nosql_migrator_spark.engine import (
        migrate_from_dump,
        migrate_streamed,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.session import (
        get_spark,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.sinks import (
        write_json_collections,
    )

    spark = get_spark(app_name="rdnm-cli", master=args.master)
    log_content = None
    if args.log:
        with open(args.log) as fh:
            log_content = fh.read()

    streamed = {}
    if args.dump:
        with open(args.dump) as fh:
            collections = migrate_from_dump(
                spark,
                fh.read(),
                log_content=log_content,
                log_dialect=args.dialect,
                normalize_dates=not args.no_normalize_dates,
            )
    else:
        # Heavy roots (plans/nesting.stream_plan) assemble per-root in
        # file space — the parquet-tables path carries the catalog row
        # counts the decision needs; dump inputs are small by nature.
        collections, streamed = migrate_streamed(
            spark,
            args.tables,
            log_content=log_content,
            log_dialect=args.dialect,
            normalize_dates=not args.no_normalize_dates,
        )

    # Doc counts are write-time byproducts of the sink (streamed roots
    # from the collected roots frame, distributed writes via an
    # observe() metric): no NDJSON re-read, no re-execution of each
    # collection's plan for a .count().
    counts: dict[str, int] = {}
    write_json_collections(
        collections,
        args.out,
        single_file=args.single_file,
        zip_path=args.zip_path,
        streamed=streamed,
        counts=counts,
    )
    print(json.dumps({"out": args.out, "collections": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
