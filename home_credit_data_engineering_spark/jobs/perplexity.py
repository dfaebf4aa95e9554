"""LM perplexity scoring job CLI: documents parquet → per-document
(doc_id, n_tokens, ppl, bucket) parquet, CCNet-style (see
``operators/lm.py``; Wenzek et al. arXiv:1911.00359).

Modes:

- default: self-trained unigram model, sketch-threshold buckets (the
  no-global-sort scale path);
- ``--exact-buckets``: NTILE buckets (global sort — small corpora only);
- ``--bigram``: bigram Stupid Backoff scoring (Brants et al. EMNLP'07);
- ``--order N``: N-gram Stupid Backoff (r6; ``--order 2`` ≡
  ``--bigram``, CCNet's KenLM analogue is ``--order 5``);
- ``--counts-out``: also persist the (token, c) unigram count state;
- ``--counts-in``: O(delta) refresh — merge the persisted count state
  with counts from THIS batch and score against the merged model, so a
  daily increment never rescans corpus history (unigram scoring only).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="CCNet-style LM perplexity scoring + bucketing"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--output", required=True, help="scored parquet path")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--alpha", type=float, default=0.5,
                        help="additive smoothing mass")
    parser.add_argument("--buckets", type=int, default=3,
                        help="head/middle/tail split size")
    parser.add_argument("--exact-buckets", action="store_true",
                        help="NTILE buckets (global sort) instead of "
                        "sketch thresholds")
    parser.add_argument("--bigram", action="store_true",
                        help="bigram Stupid Backoff scoring "
                        "(alias for --order 2)")
    parser.add_argument("--order", type=int, default=1,
                        help="n-gram Stupid Backoff order (2-6); 1 = "
                        "unigram CCNet scoring (default)")
    parser.add_argument("--counts-out", help="persist unigram count state")
    parser.add_argument("--counts-in",
                        help="merge this persisted count state with the "
                        "batch's counts (O(delta) refresh)")
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # Validate BEFORE routing (ADVICE r6: `--order 0` / negative values
    # silently fell through the `order > 1` check into unigram scoring).
    if args.order != 1 and not 2 <= args.order <= 6:
        raise SystemExit(
            f"--order must be 1 (unigram) or 2-6 (backoff); got {args.order}"
        )
    order = 2 if args.bigram else args.order
    if args.bigram and args.order > 1 and args.order != 2:
        raise SystemExit("--bigram conflicts with --order; use one")
    if order > 1 and (args.counts_in or args.counts_out):
        raise SystemExit(
            "n-gram backoff scoring does not use the unigram count "
            "state; drop --counts-in/--counts-out or score unigram"
        )
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.lm import (
        lm_perplexity,
        merge_unigram_counts,
        ngram_backoff_perplexity,
        perplexity_buckets,
        perplexity_buckets_approx,
        unigram_count_state,
        unigram_lm_from_counts,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="corpus-perplexity")
    docs = read_parquet(spark, args.input)

    counts = None
    if args.counts_in or args.counts_out:
        counts = unigram_count_state(docs, args.id_col, args.text_col)
        if args.counts_in:
            counts = merge_unigram_counts(read_parquet(spark, args.counts_in), counts)

    if order > 1:
        scored = ngram_backoff_perplexity(
            docs, args.id_col, args.text_col, order=order
        )
    elif counts is not None:
        import math

        model = unigram_lm_from_counts(counts, alpha=args.alpha)
        # smoothed OOV floor ln(alpha / (T + alpha*V)) for tokens absent
        # from a merged historical model (unseen in both is impossible
        # when counts include this batch, but the contract requires it)
        tot = counts.groupBy().sum("c").collect()[0][0] or 0
        v = counts.count()
        floor = math.log(args.alpha / (tot + args.alpha * max(v, 1)))
        scored = lm_perplexity(
            docs, args.id_col, args.text_col,
            model=model, unseen_logp=floor,
        )
    else:
        scored = lm_perplexity(
            docs, args.id_col, args.text_col, alpha=args.alpha
        )

    bucketed = (
        perplexity_buckets(scored, n_buckets=args.buckets)
        if args.exact_buckets
        else perplexity_buckets_approx(scored, n_buckets=args.buckets)
    )
    write_parquet(bucketed, args.output)
    if args.counts_out:
        write_parquet(counts, args.counts_out)

    n = spark.read.parquet(args.output).count()
    if args.run_log:
        append_run_log(
            args.run_log,
            {
                "job": "perplexity",
                "rows_scored": n,
                "mode": f"backoff-{order}gram" if order > 1 else "unigram",
                "buckets": args.buckets,
                "exact_buckets": bool(args.exact_buckets),
                "incremental": bool(args.counts_in),
            },
        )
    print(f"perplexity: {n} documents scored into {args.buckets} buckets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
