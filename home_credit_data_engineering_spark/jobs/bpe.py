"""BPE tokenizer job CLI (``functions/bpe.py``):

- ``--mode train``: learn a merges table from a bounded deterministic
  sample of the input corpus (a FIT step — driver-side over at most
  ``--max-docs`` texts in md5 order, like the IVF/PQ codebook jobs) and
  write it as a versioned text file;
- ``--mode count``: annotate every document with its REAL BPE token
  count under a merges file (default: the pinned fixture) via the
  Arrow-batched UDF — the narrow, shuffle-free pass whose output column
  feeds pack_sequences / token_budget_mix / chunking to budget in real
  tokenizer tokens.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Byte-level BPE: train a merges table / count real tokens"
    )
    parser.add_argument("--mode", choices=("train", "count"), required=True)
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--merges", help="merges file (count mode; default = "
                        "the pinned fixture)")
    parser.add_argument("--merges-out", help="merges file to write (train mode)")
    parser.add_argument("--output", help="annotated parquet path (count mode)")
    parser.add_argument("--num-merges", type=int, default=256)
    parser.add_argument("--max-docs", type=int, default=20_000,
                        help="training sample bound (driver-side)")
    parser.add_argument("--count-col", default="bpe_token_count")
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.mode == "train" and not args.merges_out:
        raise SystemExit("--mode train requires --merges-out")
    if args.mode == "count" and not args.output:
        raise SystemExit("--mode count requires --output")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.functions.bpe import (
        load_merges,
        save_merges,
        train_bpe_merges,
        with_bpe_token_count,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="corpus-bpe")
    docs = read_parquet(spark, args.input)

    if args.mode == "train":
        merges = train_bpe_merges(
            docs, args.text_col,
            num_merges=args.num_merges, max_docs=args.max_docs,
        )
        save_merges(merges, args.merges_out)
        record = {"job": "bpe", "mode": "train", "n_merges": len(merges)}
        print(f"bpe train: {len(merges)} merges -> {args.merges_out}")
    else:
        merges = load_merges(args.merges) if args.merges else load_merges()
        counted = with_bpe_token_count(
            docs, args.text_col, merges=merges, out_col=args.count_col
        )
        write_parquet(counted, args.output)
        n = spark.read.parquet(args.output).count()
        record = {
            "job": "bpe", "mode": "count",
            "n_merges": len(merges), "rows_counted": n,
        }
        print(f"bpe count: {n} documents annotated with {args.count_col}")
    if args.run_log:
        append_run_log(args.run_log, record)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
