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

    sweep = sub.add_parser(
        "sweep",
        help="discover every state tree under a lake root, finish its "
        "pending crash recovery, compact streamed stats deltas past the "
        "replay window, and print one drift/file-count report (run with "
        "maintaining streams STOPPED)",
    )
    sweep.add_argument("--root", required=True)
    sweep.add_argument(
        "--compact-deltas-window", type=int, default=16,
        help="fold a streamed ANN index's stats deltas once more than "
        "this many batch partitions exist",
    )
    sweep.add_argument(
        "--reconcile", action="store_true",
        help="also sweep abandoned-fingerprint delta residue out of "
        "prefix-state trees. Opt-in: a fold in flight (published files, "
        "marker not yet committed) looks exactly like residue, so only "
        "run this when no fold is running anywhere in the lake",
    )
    sweep.add_argument(
        "--dry-run", action="store_true",
        help="report-only: mutate NOTHING, print what recovery/compaction "
        "WOULD do, and exit 3 when any tree needs recovery or compaction "
        "(0 when the lake is clean) — the check mode for operators who "
        "want the report without the chores",
    )

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


def _prefix_state_extra(r: dict) -> str:
    """Compaction suffix shared by the prefix-state families' report
    lines (jaccard / containment)."""
    extra = ""
    if "deltas_compacted" in r:
        extra += (
            f", delta files {r['deltas_compacted']['before']}"
            f"->{r['deltas_compacted']['after']}"
        )
    if "would_compact_deltas" in r:
        extra += (
            f", would compact "
            f"{r['would_compact_deltas']['files']} delta files "
            f"(window {r['would_compact_deltas']['window']})"
        )
    if r.get("compaction_blocked_by_orphans"):
        extra += (
            ", compaction blocked by unledgered residue "
            "(run --reconcile first)"
        )
    return extra


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

    if args.command == "sweep":
        from home_credit_data_engineering_spark import get_session
        from home_credit_data_engineering_spark.sources.sweep import sweep_lake

        spark = get_session(app_name="maintenance-sweep")
        reports = sweep_lake(
            spark, args.root,
            compact_deltas_window=args.compact_deltas_window,
            dry_run=args.dry_run,
            reconcile_orphans=args.reconcile,
        )
        recovered = sum(r["recovered"] for r in reports)
        for r in reports:
            if r["family"] == "ann":
                extra = (
                    f"{r['n_vectors']} vectors / {r['n_cells']} cells, "
                    f"max_mean_shift={r['max_mean_shift']:.4f}, "
                    f"imbalance={r['size_imbalance']:.2f}, "
                    f"rebuild_recommended={r['rebuild_recommended']}"
                )
                if "deltas_compacted" in r:
                    extra += (
                        f", deltas {r['deltas_compacted']['before']}"
                        f"->{r['deltas_compacted']['after']}"
                    )
                if "would_compact_deltas" in r:
                    extra += (
                        f", would compact "
                        f"{r['would_compact_deltas']['batches']} delta "
                        f"batches (window "
                        f"{r['would_compact_deltas']['window']})"
                    )
                tag = f"ann-{r['kind']}/{r['maintainer']}"
            elif r["family"] == "bm25":
                extra = f"{r['n_docs']} docs, avgdl={r['avgdl']:.3f}"
                if r["batches"] is not None:
                    extra += f", {r['batches']} batches"
                tag = f"bm25/{r['maintainer']}"
            elif r["family"] == "jaccard":
                extra = (
                    f"{r['n_docs']} docs / {r['n_prefix_rows']} prefix rows "
                    f"/ {r['n_tokens']} tokens, t={r['threshold']}"
                    if r["n_docs"] is not None
                    else "pending recovery (details skipped in dry-run)"
                ) + _prefix_state_extra(r)
                tag = "jaccard"
            elif r["family"] == "containment":
                extra = (
                    f"{r['n_refs']} refs / {r['n_postings']} postings "
                    f"/ {r['n_tokens']} tokens, t={r['threshold']}"
                    if r["n_refs"] is not None
                    else "pending recovery (details skipped in dry-run)"
                ) + _prefix_state_extra(r)
                tag = "containment"
            elif r["family"] == "entity":
                extra = (
                    f"{r['snapshots']} snapshots "
                    f"(latest batch={r['latest_batch']})"
                )
                tag = "entity"
            elif r["family"] == "orphan-swap":
                extra = f"mid-root-swap tree {r['action']}"
                tag = "orphan-swap"
            else:
                extra = ", ".join(
                    f"{leg}:{v['batches']}b/{v['parquet_files']}f"
                    for leg, v in r["legs"].items()
                )
                tag = "corpus"
            print(
                f"sweep[{tag}]: {r['path']} — {r['parquet_files']} files, "
                f"recovered={r['recovered']}, {extra}"
            )
        if args.dry_run:
            would_compact = sum(
                1 for r in reports if "would_compact_deltas" in r
            )
            blocked = sum(
                1
                for r in reports
                if r.get("compaction_blocked_by_orphans")
            )
            print(
                f"sweep (dry-run): {len(reports)} state trees, "
                f"{recovered} pending swaps/commits, "
                f"{would_compact} compactable delta trees"
                + (
                    f", {blocked} blocked by unledgered residue"
                    if blocked
                    else ""
                )
                + " — nothing touched"
            )
            # documented contract: non-zero when the lake needs work — a
            # tree whose compaction is BLOCKED by residue needs work too
            # (reconcile, then compact), so it must not read as clean
            return 3 if (recovered or would_compact or blocked) else 0
        print(
            f"sweep: {len(reports)} state trees, "
            f"{recovered} recovered swaps/commits"
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
