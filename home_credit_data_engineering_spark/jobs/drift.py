"""Snapshot-drift job CLI (``operators/reconcile.py:snapshot_drift``):
compare two table snapshots, write the drift report, and optionally FAIL
the run when guarded metrics changed — the promotion gate a nightly
ingest pipeline runs before swapping a snapshot into production.

``--fail-on`` takes comma-separated ``column/metric`` patterns
(``*`` wildcards allowed, e.g. ``*/dtype,*/present,__table__/row_count``);
if any matching report row has ``changed = true`` the job exits 3 after
writing the report, so orchestrators gate on the exit code while the
report parquet keeps the evidence.

Numeric VALUE drift (r9, VERDICT r8 #6): unless ``--no-distributions``,
the report also carries per-numeric-column ``psi`` and ``ks`` rows
(``operators/reconcile.py:distribution_drift`` — PSI over old-side GK
quantile bins, KS on the same grid), so ``--fail-on '*/psi'`` gates on
distribution shift a row-count/null/cardinality profile cannot see.
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
        "--no-distributions",
        action="store_true",
        help="skip the numeric psi/ks distribution-shift rows",
    )
    parser.add_argument("--bins", type=int, default=10,
                        help="quantile bins for psi/ks")
    parser.add_argument("--psi-threshold", type=float, default=0.2)
    parser.add_argument("--ks-threshold", type=float, default=0.1)
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
        distribution_drift,
        snapshot_drift,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="snapshot-drift")
    old = read_parquet(spark, args.old)
    new = read_parquet(spark, args.new)
    report = snapshot_drift(old, new)
    if not args.no_distributions:
        report = report.unionByName(
            distribution_drift(
                old,
                new,
                n_bins=args.bins,
                psi_threshold=args.psi_threshold,
                ks_threshold=args.ks_threshold,
            )
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
