"""y-logcli-parity command line front end.

Usage (mirrors reference ``y-logcli:18-38``)::

    python -m kubernetes_logs_datalake_spark.cli \
        --context=dev --root=/data/lake \
        query '{namespace="qa",pod="app-1"}' \
        [--since=5m] [-o table|raw|lines|columns] [-f arrow|parquet|both] \
        [--layout=native|positional] [--explain]

Differences from the reference, by design: the executed "SQL echo"
prints the Catalyst plan; ``--layout`` selects between our hive lake
and the reference's positional key layout; ``-f both`` is the default
exactly like the reference.
"""

from __future__ import annotations

import argparse
import sys

from kubernetes_logs_datalake_spark.plans.logquery import LogQuery
from kubernetes_logs_datalake_spark.plans.render import render
from kubernetes_logs_datalake_spark.plans.selector import parse_selector
from kubernetes_logs_datalake_spark.session import get_spark
from kubernetes_logs_datalake_spark.sources.logs import LogLake


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="y-logcli", description=__doc__)
    p.add_argument("--context", required=True, help="cluster name (path depth 1)")
    p.add_argument("--root", required=True, help="lake root path/URI (e.g. s3a://bucket)")
    p.add_argument("command", choices=["query"])
    p.add_argument("selector", help='PromQL-style selector, e.g. \'{namespace="qa"}\'')
    p.add_argument("--since", default=None, help="<N>s|<N>m|<N>h|<N>d time window")
    p.add_argument("-o", dest="output", default="table",
                   choices=["table", "raw", "lines", "columns"])
    p.add_argument("-f", dest="fmt", default="both", choices=["arrow", "parquet", "both"])
    p.add_argument("--layout", default="native", choices=["native", "positional"])
    p.add_argument("--explain", action="store_true", help="echo the executed plan")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        selectors = parse_selector(args.selector)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    spark = get_spark("y-logcli")
    lake = LogLake(args.root, layout=args.layout)
    q = LogQuery(
        lake,
        cluster=args.context,
        selectors=selectors,
        since=args.since,
        fmt=args.fmt,
        output=args.output,
    )
    try:
        df = q.projected(spark)
        for line in render(df, args.output):
            print(line)
    except Exception as e:  # noqa: BLE001 — CLI boundary: every query
        # failure (bad selector, absent lake root, unreadable files)
        # renders as the handled 'error:' + exit-2 contract, never a
        # raw Py4J traceback
        print(f"error: {e}", file=sys.stderr)
        return 2
    if args.explain:
        # reference echoes the generated SQL after results (y-logcli:277-279)
        print("\n-- plan executed:")
        print(q.explain_str(spark))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
