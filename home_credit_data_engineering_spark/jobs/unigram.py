"""Unigram-LM tokenizer job CLI (``functions/unigram.py``): train a
SentencePiece-style vocabulary over a documents parquet with the
distributed EM trainer, and/or encode a corpus to token-id arrays that
``jobs/pack_corpus.py --ids-col`` packs unchanged.

Modes (composable in one invocation):
  --train --vocab-out V          fit on --input, save piece\\tlogprob file
  --vocab V --encode-out E       encode --input with vocab V (or the one
                                 just trained) into (id_col, token_ids)
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Unigram-LM (SentencePiece-style) tokenizer: "
        "distributed EM train + corpus encode"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--train", action="store_true", help="fit a vocabulary")
    parser.add_argument("--vocab-out", help="where --train saves the vocab")
    parser.add_argument("--vocab", help="existing vocab file (encode mode)")
    parser.add_argument("--vocab-size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--max-piece-len", type=int, default=6)
    parser.add_argument("--max-seed-pieces", type=int, default=4096)
    parser.add_argument(
        "--encode-out",
        help="write (id_col, token_ids) parquet — feed to "
        "jobs/pack_corpus.py --ids-col token_ids",
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.train and not args.vocab_out:
        raise SystemExit("--train requires --vocab-out")
    if not args.train and not args.vocab:
        raise SystemExit("need --train or --vocab")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.functions.unigram import (
        load_unigram,
        save_unigram,
        train_unigram,
        unigram_token_ids_col,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    spark = get_session(app_name="unigram-tokenizer")
    docs = read_parquet(spark, args.input)
    record: dict = {"job": "unigram", "input": args.input}
    if args.train:
        vocab = train_unigram(
            docs,
            args.text_col,
            vocab_size=args.vocab_size,
            num_iters=args.iters,
            max_piece_len=args.max_piece_len,
            max_seed_pieces=args.max_seed_pieces,
        )
        save_unigram(vocab, args.vocab_out)
        record.update(vocab_out=args.vocab_out, vocab_pieces=len(vocab))
        print(f"unigram: trained {len(vocab)} pieces -> {args.vocab_out}")
    else:
        vocab = load_unigram(args.vocab)
    if args.encode_out:
        from pyspark.sql import functions as F

        enc = docs.select(
            F.col(args.id_col),
            unigram_token_ids_col(
                args.text_col, vocab, args.max_piece_len
            ).alias("token_ids"),
        )
        enc.write.mode("overwrite").parquet(args.encode_out)
        n = spark.read.parquet(args.encode_out).count()
        record.update(encode_out=args.encode_out, rows_encoded=int(n))
        print(f"unigram: encoded {n} documents -> {args.encode_out}")
    if args.run_log:
        append_run_log(args.run_log, record)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
