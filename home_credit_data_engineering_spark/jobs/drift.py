"""Snapshot-drift job CLI (``operators/reconcile.py:snapshot_drift``):
compare two table snapshots, write the drift report, and optionally FAIL
the run when guarded metrics changed — the promotion gate a nightly
ingest pipeline runs before swapping a snapshot into production.

``--fail-on`` takes comma-separated ``column/metric`` patterns
(``*`` wildcards allowed, e.g. ``*/dtype,*/present,__table__/row_count``);
if any matching report row has ``changed = true`` the job exits 3 after
writing the report, so orchestrators gate on the exit code while the
report parquet keeps the evidence.
"""

from __future__ import annotations

import argparse
import fnmatch


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Schema/profile drift between two table snapshots"
    )
    parser.add_argument("--old", required=True, help="baseline parquet path")
    parser.add_argument("--new", required=True, help="candidate parquet path")
    parser.add_argument("--output", required=True, help="drift report parquet")
    parser.add_argument(
        "--fail-on",
        help="comma-separated column/metric patterns (fnmatch wildcards) "
        "that must NOT have changed; exit 3 if any did",
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.reconcile import (
        snapshot_drift,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="snapshot-drift")
    report = snapshot_drift(
        read_parquet(spark, args.old), read_parquet(spark, args.new)
    )
    write_parquet(report, args.output)
    breached: list[str] = []
    if args.fail_on:
        patterns = [p.strip() for p in args.fail_on.split(",") if p.strip()]
        # the report is |columns| x |metrics| — a bounded driver read
        for row in spark.read.parquet(args.output).collect():
            key = f"{row.column}/{row.metric}"
            if row.changed and any(
                fnmatch.fnmatch(key, pat) for pat in patterns
            ):
                breached.append(key)
    if args.run_log:
        append_run_log(
            args.run_log,
            {
                "job": "drift",
                "old": args.old,
                "new": args.new,
                "output": args.output,
                "breached": sorted(breached),
            },
        )
    if breached:
        print(
            "DRIFT GATE BREACHED: "
            + ", ".join(sorted(breached))
        )
        return 3
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
