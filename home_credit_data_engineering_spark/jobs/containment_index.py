"""Containment decontamination-state job CLI: build (FIXED reference
parquet → persisted postings/ref-sets/frozen-token-order tree) and O(Δ)
increment (--state-dir with an existing tree): fold a batch of NEW
probe documents against the persisted reference, write the verified
(probe_id, ref_id, containment) pairs, print the fold report.

Replay-idempotent by the processed-delta ledger; semantic parameters
(threshold/shingle_k) are pinned in the tree's meta sidecar at build
time. Unlike ``jobs/jaccard_index.py`` there is no ``--all-texts``:
probe docs never pair with each other, so the delta carries its own
verification sets and the reference's are persisted. See
``operators/containment_state.py`` for the machinery and
``operators/dedup.py:containment_join_increment`` for the math.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Build / incrementally probe a containment "
        "decontamination-state tree"
    )
    parser.add_argument("--input", required=True,
                        help="documents parquet path (the FIXED reference "
                        "corpus for a build; the NEW probe batch for an "
                        "increment)")
    parser.add_argument("--state-dir", required=True,
                        help="state tree root. No tree there yet = build "
                        "from the reference; existing tree = O(batch) "
                        "probe increment")
    parser.add_argument("--output-pairs",
                        help="increment mode: write the verified "
                        "(probe_id, ref_id, containment) pairs here")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--threshold", type=float, default=0.8,
                        help="build mode only (pinned in the tree's meta; "
                        "increments ignore it by design)")
    parser.add_argument("--shingle-k", type=int, default=3,
                        help="build mode only (pinned like --threshold)")
    parser.add_argument("--collapse-exact", action="store_true",
                        help="increment mode: collapse byte-identical "
                        "probe docs before candidate generation "
                        "(bit-identical pairs/state; the boilerplate-"
                        "heavy-delta regime)")
    return parser


def main(argv: list[str] | None = None) -> int:
    import os

    args = build_parser().parse_args(argv)

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.containment_state import (
        META_NAME,
        containment_state_increment,
        read_containment_meta,
        write_containment_state,
    )

    spark = get_session(app_name="containment-index")
    docs = spark.read.parquet(args.input)

    if not os.path.isfile(os.path.join(args.state_dir, META_NAME)):
        stats = write_containment_state(
            docs,
            args.state_dir,
            id_col=args.id_col,
            text_col=args.text_col,
            threshold=args.threshold,
            shingle_k=args.shingle_k,
        )
        print(
            f"build: {stats['n_refs']} reference docs, "
            f"{stats['n_postings']} postings, {stats['n_tokens']} tokens "
            f"at t={args.threshold}, k={args.shingle_k} -> {args.state_dir}"
        )
        return 0

    meta = read_containment_meta(args.state_dir)
    result = containment_state_increment(
        docs,
        args.state_dir,
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
        f"increment: {rep['n_pairs']} contaminated pairs at "
        f"t={meta['threshold']} ({rep['candidate_pairs']} candidates vs "
        f"{rep['brute_force_pairs']} brute-force), "
        f"+{rep['n_new_tokens']} tokens (fold {rep['delta_fingerprint']})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
