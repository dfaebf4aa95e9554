"""Storage maintenance job CLI: compaction and snapshot retention."""

from __future__ import annotations

import argparse
import datetime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Parquet lake maintenance: compact small files / expire snapshots"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    compact = sub.add_parser("compact", help="rewrite a dataset to N files")
    compact.add_argument("--path", required=True)
    compact.add_argument("--target-files", type=int, required=True)
    compact.add_argument(
        "--cluster-by", nargs="*", default=None,
        help="optionally re-cluster on these columns while rewriting",
    )

    streamed = sub.add_parser(
        "compact-streamed",
        help="fold old batch partitions of a streaming-maintained ANN or "
        "BM25 index (content-identical; run with the stream STOPPED)",
    )
    streamed.add_argument("--path", required=True)
    streamed.add_argument("--kind", choices=["ann", "bm25"], required=True)

    expire = sub.add_parser(
        "expire", help="drop year/month/day partitions older than a retention window"
    )
    expire.add_argument("--path", required=True)
    expire.add_argument("--keep-days", type=int, required=True)
    expire.add_argument(
        "--as-of", default=datetime.date.today().isoformat(),
        help="retention anchor date (default: today)",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "compact":
        from home_credit_data_engineering_spark import get_session
        from home_credit_data_engineering_spark.sources.maintenance import (
            compact_parquet,
        )

        spark = get_session(app_name="maintenance-compact")
        stats = compact_parquet(
            spark, args.path, args.target_files, cluster_by=args.cluster_by or None
        )
        print(
            f"compact: {stats['files_before']} -> {stats['files_after']} files, "
            f"{stats['rows']} rows"
        )
        return 0

    if args.command == "compact-streamed":
        from home_credit_data_engineering_spark import get_session

        spark = get_session(app_name="maintenance-compact-streamed")
        if args.kind == "ann":
            from home_credit_data_engineering_spark.streaming.ann import (
                compact_streamed_ann_index,
            )

            rep = compact_streamed_ann_index(spark, args.path)
        else:
            from home_credit_data_engineering_spark.streaming.bm25 import (
                compact_streamed_bm25_index,
            )

            rep = compact_streamed_bm25_index(spark, args.path)
        print(
            f"compact-streamed[{args.kind}]: {rep['batches_before']} -> "
            f"{rep['batches_after']} batch partitions"
        )
        return 0

    # expire: pure driver-side fs walk — no Spark session needed. The
    # allowlist is every date inside the retention window; a miscomputed
    # window keeps extra days rather than deleting the lake.
    from home_credit_data_engineering_spark.sources.maintenance import (
        expire_snapshots,
    )

    anchor = datetime.date.fromisoformat(args.as_of)
    keep = {
        ((d := anchor - datetime.timedelta(days=i)).year, d.month, d.day)
        for i in range(args.keep_days)
    }
    removed = expire_snapshots(args.path, keep_dates=keep)
    print(f"expire: removed {len(removed)} partitions")
    for p in removed:
        print(f"  {p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
