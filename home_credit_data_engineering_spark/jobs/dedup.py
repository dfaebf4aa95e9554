"""Corpus dedup job CLI: documents parquet → deduplicated parquet +
removal list + JSONL run log."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Two-stage corpus dedup (exact md5 + MinHash-LSH/CC)"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--output", required=True, help="deduped parquet path")
    parser.add_argument(
        "--removals-output", required=True, help="removal-list parquet path"
    )
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--num-hashes", type=int, default=32)
    parser.add_argument("--bands", type=int, default=8)
    parser.add_argument("--near-threshold", type=float, default=0.7)
    parser.add_argument(
        "--collapse-exact",
        action="store_true",
        help="route the near stage through the collapse-exact-first "
        "MinHash (production posture for duplicate-heavy corpora; "
        "removal list is identical)",
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.corpus import dedup_corpus
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="corpus-dedup")
    docs = read_parquet(spark, args.input)
    result = dedup_corpus(
        spark,
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        num_hashes=args.num_hashes,
        bands=args.bands,
        near_threshold=args.near_threshold,
        run_log=args.run_log,
        collapse_exact=args.collapse_exact,
    )
    write_parquet(result["deduped"], args.output)
    write_parquet(result["removals"], args.removals_output)
    r = result["report"]
    print(
        f"dedup_corpus: {r.rows_in} in, {r.exact_removed} exact + "
        f"{r.near_removed} near removed, {r.rows_out} out"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
