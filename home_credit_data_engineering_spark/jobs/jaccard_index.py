"""Exact-Jaccard prefix-state job CLI: build (documents parquet →
persisted frozen-token-order prefix state) and O(Δ) increment
(--state-dir with an existing tree): fold a batch of NEW documents in,
write the verified delta-touching pairs, print the fold report.

Replay-idempotent by the processed-delta ledger (a re-run of a
completed fold is a no-op that reports ``replayed``); semantic
parameters (threshold/shingle_k) are pinned in the tree's meta sidecar
at build time — increments always fold under the state's own semantics.
See ``operators/jaccard_state.py`` for the machinery and
``operators/dedup.py:jaccard_join_increment`` for the math.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Build / incrementally fold an exact-Jaccard "
        "prefix-state tree"
    )
    parser.add_argument("--input", required=True,
                        help="documents parquet path (full corpus for a "
                        "build; the NEW batch for an increment)")
    parser.add_argument("--state-dir", required=True,
                        help="state tree root. No tree there yet = full "
                        "build; existing tree = O(batch) increment")
    parser.add_argument("--all-texts",
                        help="increment mode: parquet holding the text of "
                        "every id that can appear in a candidate pair "
                        "(accepted corpus ∪ the new batch)")
    parser.add_argument("--output-pairs",
                        help="increment mode: write the verified "
                        "delta-touching (doc_a, doc_b, jaccard) pairs here")
    parser.add_argument("--collapse-exact", action="store_true",
                        help="increment mode: collapse byte-identical "
                        "docs within the delta before candidate "
                        "generation and expand after — bit-identical "
                        "pairs/state, d-squared fewer candidates on a "
                        "boilerplate-heavy delta")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="build mode only (pinned in the tree's meta; "
                        "increments ignore it by design)")
    parser.add_argument("--shingle-k", type=int, default=3,
                        help="build mode only (pinned like --threshold)")
    return parser


def main(argv: list[str] | None = None) -> int:
    import os

    args = build_parser().parse_args(argv)

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        META_NAME,
        jaccard_state_increment,
        read_jaccard_meta,
        write_jaccard_state,
    )

    spark = get_session(app_name="jaccard-index")
    docs = spark.read.parquet(args.input)

    if not os.path.isfile(os.path.join(args.state_dir, META_NAME)):
        stats = write_jaccard_state(
            docs,
            args.state_dir,
            id_col=args.id_col,
            text_col=args.text_col,
            threshold=args.threshold,
            shingle_k=args.shingle_k,
        )
        print(
            f"build: {stats['n_prefix_rows']} prefix rows, "
            f"{stats['n_tokens']} tokens at t={args.threshold}, "
            f"k={args.shingle_k} -> {args.state_dir}"
        )
        return 0

    if not args.all_texts:
        raise SystemExit(
            "increment mode (existing state tree) requires --all-texts"
        )
    meta = read_jaccard_meta(args.state_dir)
    # --output-pairs rides INSIDE the fold (written before the ledger
    # marker commits): a caller-side write here would sit past the
    # commit point, and a crash in that window would strand a completed
    # marker whose replay can never regenerate the pairs
    result = jaccard_state_increment(
        docs,
        args.state_dir,
        spark.read.parquet(args.all_texts),
        output_pairs=args.output_pairs,
        collapse_exact=args.collapse_exact,
    )
    rep = result["report"]
    if result["replayed"]:
        where = (
            f"; pairs at {rep['output_pairs']}"
            if rep.get("output_pairs")
            else ""
        )
        print(
            f"increment: fold {rep['delta_fingerprint']} already applied "
            f"(replayed — no-op); {rep['n_pairs']} pairs at the time{where}"
        )
        return 0
    print(
        f"increment: {rep['n_pairs']} delta-touching pairs at "
        f"t={meta['threshold']}, +{rep['n_new_prefix_rows']} prefix rows, "
        f"+{rep['n_new_tokens']} tokens (fold {rep['delta_fingerprint']})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
