"""Entity-resolution job CLI: records parquet → resolved entity state
(one row per record with ``entity_id`` = its component's survivor id).

Two modes, same state schema (id + entity_id + blocking/compare
columns), mirroring the corpus-pipeline CLI pair:

- **full** (default): block → score (levenshtein) → star-CC resolve the
  whole input, write the state.
- **incremental** (``--state-dir``): fold today's batch into the
  persisted state in O(batch-touched blocks) — new match edges +
  per-touched-member anchor edges drive the CC, absorbed entities are
  renamed via an id→id map (``operators/linkage.py:
  incremental_resolve_entities``), and the updated state lands with a
  two-phase write (``entities__next`` → swap) so a failed run never
  corrupts yesterday's state.

Clerical-review loop (r11): full mode with ``--review-queue`` scores the
candidate pairs with EM-estimated Fellegi-Sunter weights, three-way
classifies them (``--fs-upper``/``--fs-lower``), and persists the
``possible`` band as a bucket-partitioned queue; ``--fold-reviews``
(with ``--state-dir``) then reads a decisions parquet and folds the
accepted pairs back into the resolved state in O(touched entities)
(``operators/linkage.py:fold_review_decisions``).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Entity resolution (blocking + levenshtein + CC)"
    )
    parser.add_argument("--input", required=True, help="records parquet path")
    parser.add_argument("--id-col", required=True)
    parser.add_argument(
        "--block-cols",
        required=True,
        help="comma-separated blocking columns (pair budget dial)",
    )
    parser.add_argument("--name-col", required=True, help="compare column")
    parser.add_argument("--max-lev", type=int, default=1)
    parser.add_argument(
        "--max-block-rows",
        type=int,
        default=1_000_000,
        help="hard cap per block (full mode; quadratic guard)",
    )
    parser.add_argument(
        "--output", help="state parquet path (full mode; required there)"
    )
    parser.add_argument(
        "--state-dir",
        help="incremental mode: persisted state directory; --input is "
        "today's batch of NEW record ids",
    )
    parser.add_argument(
        "--index-output",
        help="also write the bucket-partitioned serving index "
        "(by_record/ + by_entity/, partition-pruned point lookups)",
    )
    parser.add_argument("--index-buckets", type=int, default=64)
    parser.add_argument(
        "--report-fs-params",
        action="store_true",
        help="full mode: also run unsupervised EM (Winkler) over the "
        "candidate pairs' agreement pattern counts and print estimated "
        "m/u/prevalence for the name-agreement attribute",
    )
    parser.add_argument(
        "--review-queue",
        help="full mode: Fellegi-Sunter-score the candidate pairs with "
        "EM-estimated m/u, three-way classify (--fs-upper/--fs-lower), "
        "and write the 'possible' band as a bucket-partitioned clerical "
        "review queue at this path (by_a/ + by_b/, pruned point lookups)",
    )
    parser.add_argument("--fs-upper", type=float, default=2.0,
                        help="FS score at/above which a pair auto-links")
    parser.add_argument("--fs-lower", type=float, default=-2.0,
                        help="FS score below which a pair auto-rejects")
    parser.add_argument(
        "--tune-blocking",
        help="report mode: comma-separated name-prefix lengths to sweep "
        "(e.g. 1,2,3,4); each length becomes a candidate blocking scheme "
        "alongside the given --block-cols, and the pair-budget-vs-recall "
        "frontier (recall proxy: matched pairs retained vs the union of "
        "all candidate generators) is written to --output and printed",
    )
    parser.add_argument(
        "--fold-reviews",
        action="store_true",
        help="incremental mode variant: --input is a DECISIONS parquet "
        "({id}_a, {id}_b, decision) — accepted pairs become match edges "
        "and the persisted --state-dir state is re-resolved in "
        "O(touched entities) (two-phase swap, like a record batch)",
    )
    return parser


def _matcher(max_lev: int, name_col: str):
    from pyspark.sql import functions as F

    def match(pairs):
        # thresholded levenshtein: banded DP rejects non-matches in
        # O(max_lev·len); -1 marks over-bound, so >= 0 == (lev <= k)
        return pairs.filter(
            F.levenshtein(
                F.col(f"{name_col}_a"), F.col(f"{name_col}_b"), max_lev
            )
            >= 0
        )

    return match


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.state_dir and not args.output:
        raise SystemExit("--output is required in full mode")
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        incremental_resolve_entities,
        resolve_entities,
        write_entity_index,
    )
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="entity-resolution")
    block_cols = [c.strip() for c in args.block_cols.split(",") if c.strip()]
    cols = [args.id_col, *block_cols, args.name_col]

    if args.fold_reviews:
        # --input is a decisions parquet; fold accepted pairs into the
        # persisted state (same two-phase swap as a record batch).
        if not args.state_dir:
            raise SystemExit("--fold-reviews requires --state-dir")
        from home_credit_data_engineering_spark.operators.linkage import (
            fold_review_decisions,
        )
        from home_credit_data_engineering_spark.sources.maintenance import (
            recover_state_swap,
            staged_state_path,
            swap_in_state,
        )

        state_path = os.path.join(args.state_dir, "entities")
        recover_state_swap(state_path)
        if not os.path.isdir(state_path):
            raise SystemExit(
                f"--fold-reviews needs an existing state at {state_path}"
            )
        decisions = read_parquet(spark, args.input)
        state = spark.read.parquet(state_path)
        updated = fold_review_decisions(
            state,
            decisions,
            args.id_col,
            f"{args.id_col}_a",
            f"{args.id_col}_b",
        )
        updated.write.mode("overwrite").parquet(staged_state_path(state_path))
        swap_in_state(state_path)
        updated_state = spark.read.parquet(state_path)
        if args.index_output:
            write_entity_index(
                updated_state, args.index_output, args.id_col,
                n_buckets=args.index_buckets,
            )
        n_ent = updated_state.select("entity_id").distinct().count()
        print(
            f"entity_resolution: folded reviews; state now "
            f"{updated_state.count()} records, {n_ent} entities"
        )
        return 0

    records = read_parquet(spark, args.input).select(*dict.fromkeys(cols))
    match = _matcher(args.max_lev, args.name_col)

    if args.tune_blocking:
        if not args.output:
            raise SystemExit("--tune-blocking requires --output")
        from home_credit_data_engineering_spark.operators.linkage import (
            tune_blocking,
        )

        lengths = [
            int(x) for x in args.tune_blocking.split(",") if x.strip()
        ]
        schemes: dict[str, list] = {
            f"name_prefix_{n}": [F.substring(F.col(args.name_col), 1, n)]
            for n in lengths
        }
        schemes[f"given:{args.block_cols}"] = list(block_cols)
        report = tune_blocking(
            records,
            args.id_col,
            schemes,
            match,
            carry_cols=[args.name_col],
            max_block_rows=args.max_block_rows,
        )
        write_parquet(report, args.output)
        for r in spark.read.parquet(args.output).orderBy(
            F.col("recall_proxy").desc(), F.col("n_pairs").asc()
        ).collect():
            print(
                "tune_blocking: %-24s pairs=%-8d frac=%.6f matched=%-6d "
                "recall=%.4f"
                % (
                    r["scheme"],
                    r["n_pairs"],
                    r["pair_fraction"],
                    r["n_matched"],
                    r["recall_proxy"],
                )
            )
        return 0

    if args.state_dir:
        from home_credit_data_engineering_spark.sources.maintenance import (
            recover_state_swap,
            staged_state_path,
            swap_in_state,
        )

        state_path = os.path.join(args.state_dir, "entities")
        # Crash recovery for the two-phase swap below (shared helper;
        # recovery rules documented on recover_state_swap).
        recover_state_swap(state_path)
        if os.path.isdir(state_path):
            state = spark.read.parquet(state_path)
        else:
            state = (
                records.limit(0)
                .withColumn("entity_id", F.col(args.id_col))
                .select(
                    args.id_col,
                    "entity_id",
                    *[c for c in cols if c != args.id_col],
                )
            )
        updated = incremental_resolve_entities(
            state,
            records,
            args.id_col,
            block_cols,
            [args.name_col],
            match,
        )
        # The incremental index refresh diffs against the PRE-swap state;
        # a crash between the state swap and the refresh would leave the
        # index permanently stale (the next run's diff base already
        # contains this batch). A _refresh_pending sentinel written
        # before the swap detects that window: if a previous run left it
        # behind, fall back to the self-healing full index rewrite.
        pending = (
            os.path.join(args.index_output, "_refresh_pending")
            if args.index_output
            else None
        )
        # _index_meta.json is the LAST artifact write_entity_index emits,
        # so it doubles as the completeness marker: a crash mid
        # full-write leaves it absent and the next run rewrites in full
        # (pre-pin indexes migrate through one full rewrite the same way)
        do_refresh = bool(args.index_output) and os.path.exists(
            os.path.join(args.index_output, "_index_meta.json")
        ) and not os.path.exists(pending)
        if pending:
            os.makedirs(args.index_output, exist_ok=True)
            with open(pending, "w") as fh:
                fh.write("")
        # Two-phase swap: the plan READS yesterday's state files, so an
        # in-place overwrite would consume its own input.
        # the prior state is the diff base for the O(touched buckets)
        # index refresh below; checkpoint it BEFORE the swap deletes the
        # files its plan reads (only when that branch will actually run —
        # the full rewrite needs no diff base)
        prior_state = state.localCheckpoint(eager=True) if do_refresh else None
        updated.write.mode("overwrite").parquet(staged_state_path(state_path))
        swap_in_state(state_path)
        updated_state = spark.read.parquet(state_path)
        if args.index_output:
            if do_refresh:
                from home_credit_data_engineering_spark.operators.linkage import (
                    refresh_entity_index,
                )

                rep = refresh_entity_index(
                    updated_state, prior_state, args.index_output,
                    args.id_col, n_buckets=args.index_buckets,
                )
                print(
                    "entity_resolution: index refresh touched "
                    f"{len(rep['rbuckets'])}+{len(rep['ebuckets'])} buckets "
                    f"({rep['changed_rows']} changed rows)"
                )
            else:
                write_entity_index(
                    updated_state, args.index_output, args.id_col,
                    n_buckets=args.index_buckets,
                )
            os.remove(pending)
        n = updated_state.count()
        print(f"entity_resolution: state now {n} records")
        return 0

    pairs = blocked_pairs(
        records,
        id_col=args.id_col,
        block_cols=block_cols,
        carry_cols=[args.name_col],
        max_block_rows=args.max_block_rows,
    )
    resolved = resolve_entities(
        records, match(pairs), args.id_col, f"{args.id_col}_a",
        f"{args.id_col}_b",
    )
    state = resolved.select(args.id_col, "entity_id").join(
        records, on=args.id_col
    )
    if args.report_fs_params or args.review_queue:
        from home_credit_data_engineering_spark.operators.linkage import (
            estimate_fs_parameters,
            fellegi_sunter_score,
            fs_decision,
            name_similarity,
            write_review_queue,
        )

        na, nb = F.col(f"{args.name_col}_a"), F.col(f"{args.name_col}_b")
        agree_defs = [
            ("name", F.levenshtein(na, nb) <= args.max_lev),
            ("name_sim", name_similarity(na, nb) >= 0.9),
            ("prefix3", F.substring(na, 1, 3) == F.substring(nb, 1, 3)),
        ]
        agree_cols = [f"agree_{n}" for n, _ in agree_defs]
        ag = pairs.select(
            *[cond.alias(f"agree_{n}") for n, cond in agree_defs]
        )
        est = estimate_fs_parameters(ag, agree_cols)
        if args.report_fs_params:
            print(
                "fs_params: p=%.4f %s (converged=%s after %d iters)"
                % (est["p"], est["params"], est["converged"], est["iterations"])
            )
        if args.review_queue:
            # Score with the EM-estimated m/u, three-way classify, and
            # persist the clerical band for review (the consumer of
            # fs_decision's "possible" output).
            agreements = [
                (n, cond, *est["params"][f"agree_{n}"])
                for n, cond in agree_defs
            ]
            # checkpoint: the scored pair stream is consumed three times
            # (by_a write, by_b write, band counts) — without this each
            # consumer re-runs the blocked join + comparators
            scored = fellegi_sunter_score(pairs, agreements).withColumn(
                "fs_decision",
                fs_decision(F.col("fs_score"), args.fs_upper, args.fs_lower),
            ).localCheckpoint(eager=True)
            write_review_queue(
                scored,
                args.review_queue,
                f"{args.id_col}_a",
                f"{args.id_col}_b",
                n_buckets=args.index_buckets,
            )
            bands = {
                r["fs_decision"]: r["n"]
                for r in scored.groupBy("fs_decision")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            print(f"review_queue: bands={bands} at {args.review_queue}")
    write_parquet(state, args.output)
    if args.index_output:
        write_entity_index(
            spark.read.parquet(args.output), args.index_output, args.id_col,
            n_buckets=args.index_buckets,
        )
    # Summary counts from the WRITTEN parquet: `state` is an unpersisted
    # plan, so counting it would re-run the whole blocking + CC pipeline
    # twice more.
    written = spark.read.parquet(args.output)
    n_ent = written.select("entity_id").distinct().count()
    print(f"entity_resolution: {written.count()} records, {n_ent} entities")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
