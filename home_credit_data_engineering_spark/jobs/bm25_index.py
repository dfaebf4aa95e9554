"""BM25 lexical index build job CLI: documents parquet → persisted
postings/df/doclens/stats tables (hash-bucket-partitioned postings for
partition-pruned query scans — see operators/retrieval.py:
build_bm25_index). Query with --query-terms to run top-k retrieval
against an existing index."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Build or query a persisted BM25 lexical index"
    )
    parser.add_argument("--input", help="documents parquet path (build mode)")
    parser.add_argument("--index", required=True, help="index path")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--n-buckets", type=int, default=None,
                        help="term-hash partition buckets for postings/df "
                        "(build default 64; increment mode defers to the "
                        "value stored in the index and raises on mismatch)")
    parser.add_argument("--query-terms", nargs="*", default=None,
                        help="query mode: terms for ONE query; prints "
                        "top-k (doc_id, score) and exits")
    parser.add_argument("--more-like", nargs="*", type=int, default=None,
                        help="query mode: doc ids; reads their text from "
                        "--input and ranks related documents from the "
                        "index (index-backed MoreLikeThis)")
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--k1", type=float, default=1.2)
    parser.add_argument("--b", type=float, default=0.75)
    parser.add_argument("--max-df-fraction", type=float, default=1.0)
    parser.add_argument("--increment", action="store_true",
                        help="fold --input as a batch of NEW documents "
                        "into the existing --index in O(batch + vocab) "
                        "-- postings/doclens append, df/stats merge-swap; "
                        "results stay exactly equal to a full rebuild")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.query_terms is not None and args.more_like is not None:
        raise SystemExit("--query-terms and --more-like are exclusive")
    if args.more_like is not None and not args.input:
        raise SystemExit("--more-like needs --input (the query docs' text)")
    if args.query_terms is None and args.more_like is None and not args.input:
        raise SystemExit("build mode needs --input")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.retrieval import (
        bm25_query_index,
        build_bm25_index,
        more_like_this_index,
    )
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    spark = get_session(app_name="bm25-index")

    def resolve_buckets() -> int:
        # query/increment modes: an unspecified --n-buckets defers to the
        # value the index stored at build time (pre-r11 indexes: 64)
        if args.n_buckets is not None:
            return args.n_buckets
        row = spark.read.parquet(f"{args.index}/stats").first()
        return int(row["n_buckets"]) if "n_buckets" in row.__fields__ else 64

    if args.more_like is not None:
        from pyspark.sql import functions as F

        qdocs = read_parquet(spark, args.input).filter(
            F.col(args.id_col).isin(args.more_like)
        )
        top = more_like_this_index(
            spark, args.index, qdocs, k=args.k,
            id_col=args.id_col, text_col=args.text_col,
            n_buckets=resolve_buckets(), k1=args.k1, b=args.b,
            max_df_fraction=args.max_df_fraction,
        )
        for row in top.orderBy("query_id", "rank").collect():
            print(
                f"{row['query_id']}\t{row['rank']}\t{row['doc_id']}\t"
                f"{row['score']}"
            )
        return 0
    if args.query_terms is not None:
        qt = spark.createDataFrame(
            [(0, t) for t in args.query_terms],
            schema="query_id bigint, term string",
        )
        top = bm25_query_index(
            spark, args.index, qt, k=args.k,
            n_buckets=resolve_buckets(), k1=args.k1, b=args.b,
            max_df_fraction=args.max_df_fraction,
        )
        for row in top.orderBy("rank").collect():
            print(f"{row['rank']}\t{row['doc_id']}\t{row['score']}")
        return 0
    docs = read_parquet(spark, args.input)
    if args.increment:
        from home_credit_data_engineering_spark.operators.retrieval import (
            bm25_index_increment,
        )

        rep = bm25_index_increment(
            docs, args.index, id_col=args.id_col, text_col=args.text_col,
            n_buckets=args.n_buckets,
        )
        print(
            "bm25 index increment: +%d docs, %d terms touched, "
            "index now %d docs (avgdl %.3f)"
            % (rep["docs_added"], rep["terms_touched"], rep["n_docs"],
               rep["avgdl"])
        )
        return 0
    build_bm25_index(
        docs, args.index,
        id_col=args.id_col, text_col=args.text_col,
        n_buckets=args.n_buckets or 64,
    )
    print(f"bm25 index written to {args.index}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
